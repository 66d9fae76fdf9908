"""Preset fields pinned against the reference config modules.

Imports `/root/reference/src/configs/params_*.py` directly (they are pure
constants modules except for a `model.utils` import, satisfied by the repo
on sys.path) and checks that every preset in `core/config.py` carries the
reference recipe: hyperparameters, training schedule, and — for the v6
family — the VoxCommunis wiring (separate_files, lang, suffix,
exclude_langs, upsample_factor).
"""

import importlib
import sys

import pytest

from arttts_tpu.core.config import (
    MSML1H_EXCLUDE_LANGS,
    MSML1H_LANG_CODES,
    get_preset,
)

REF_SRC = "/root/reference/src"


def _ref_params(name: str):
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    if "model.monotonic_align" not in sys.modules:
        # configs import model.utils; model/__init__ pulls the Cython MAS —
        # pre-seed an empty stub (the configs never call it)
        import types

        sys.modules["model.monotonic_align"] = types.ModuleType(
            "model.monotonic_align"
        )
    return importlib.import_module(f"configs.params_{name}")


MODEL_PRESETS = [
    "v0", "v1", "v1_1", "v2", "v2_phnmtext", "v3", "v4", "v4_phnmtext",
    "v5", "v5_preblock", "v6", "v6_zhCN", "msml1h",
]


@pytest.mark.parametrize("name", MODEL_PRESETS)
def test_preset_matches_reference_module(name):
    ref = _ref_params(name)
    cfg = get_preset(name)

    # model hyperparameters
    assert cfg.model.n_feats == ref.n_feats
    assert cfg.model.encoder.n_channels == ref.n_enc_channels
    assert cfg.model.encoder.filter_channels == ref.filter_channels
    assert cfg.model.encoder.filter_channels_dp == ref.filter_channels_dp
    assert cfg.model.encoder.n_layers == ref.n_enc_layers
    assert cfg.model.encoder.kernel_size == ref.enc_kernel
    assert cfg.model.encoder.dropout == ref.enc_dropout
    assert cfg.model.encoder.n_heads == ref.n_heads
    assert cfg.model.encoder.window_size == ref.window_size
    assert cfg.model.decoder.dim == ref.dec_dim
    assert cfg.model.decoder.beta_min == ref.beta_min
    assert cfg.model.decoder.beta_max == ref.beta_max
    assert cfg.model.decoder.pe_scale == ref.pe_scale
    if hasattr(ref, "n_ipa_feats"):
        assert cfg.model.encoder.n_input_feats == ref.n_ipa_feats

    # training schedule
    assert cfg.train.n_epochs == ref.n_epochs
    assert cfg.train.batch_size == ref.batch_size
    assert cfg.train.learning_rate == ref.learning_rate
    if hasattr(ref, "random_seed"):  # params_v0 predates seeding
        assert cfg.train.random_seed == ref.random_seed
    assert cfg.train.save_every == ref.save_every
    assert cfg.train.val_every == ref.val_every
    assert cfg.train.test_size == ref.test_size
    assert cfg.train.out_size == ref.out_size
    assert cfg.train.log_dir == f"logs/{name}" or cfg.train.log_dir == ref.log_dir
    if hasattr(ref, "patience"):
        assert cfg.train.patience == ref.patience
    else:
        assert cfg.train.patience == 0  # msml1h: no early stopping

    # phnmtext presets flip the text conversion path
    if hasattr(ref, "gradtts_text_conv"):
        assert cfg.data.gradtts_text_conv == ref.gradtts_text_conv


@pytest.mark.parametrize("name", ["v6", "v6_zhCN", "msml1h"])
def test_v6_family_voxcommunis_wiring(name):
    ref = _ref_params(name)
    cfg = get_preset(name)
    assert cfg.data.separate_files == ref.separate_files
    assert cfg.data.suffix == ref.suffix
    if not ref.separate_files:
        assert cfg.data.lang == ref.lang
    assert cfg.model.encoder.use_duration_predictor is False
    assert cfg.model.n_spks > 1


def test_msml1h_language_lists():
    ref = _ref_params("msml1h")
    assert list(MSML1H_LANG_CODES) == ref.lang_codes
    assert list(MSML1H_EXCLUDE_LANGS) == ref.exclude_langs
    cfg = get_preset("msml1h")
    assert list(cfg.data.exclude_langs) == ref.exclude_langs
    assert cfg.data.language_upsample == ref.upsample_factor
