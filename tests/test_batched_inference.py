"""Batched serving-mode inference: masked-norm model, batch > 1, artifacts
match the per-sample contract."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.core.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from arttts_tpu.infer.pipeline import run_acoustic_inference_batched
from arttts_tpu.models.tts import GradTTSModel


def test_batched_acoustic_inference(tmp_path, rng):
    cfg = ExperimentConfig(
        "tiny_batched",
        ModelConfig(
            name="art_tts",
            n_feats=16,
            encoder=EncoderConfig(
                kind="ipa_trait", n_input_feats=25, n_channels=16,
                filter_channels=32, filter_channels_dp=16, n_heads=1, n_layers=1,
            ),
            decoder=DecoderConfig(dim=8, masked_norm=True),
        ),
        DataConfig(),
        TrainConfig(),
    )

    class FakeDS:
        entries = [[f"wavs/utt{i:03d}.wav"] for i in range(5)]

        def __len__(self):
            return 5

        def __getitem__(self, i):
            T = 6 + 2 * i  # varied lengths exercise padding
            r = np.random.default_rng(i)
            return {"x": r.integers(-1, 2, size=(T, 25)).astype(np.float32)}

    model = GradTTSModel(config=cfg.model)
    ds = FakeDS()
    x0 = np.asarray(ds[0]["x"])[None]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(x0),
        jnp.array([x0.shape[1]]),
        jnp.zeros((1, 32, 16)),
        jnp.ones((1, 32, 1)),
        jnp.zeros((1,)),
    )
    paths = run_acoustic_inference_batched(
        cfg, variables, ds, str(tmp_path / "preds"), batch_size=3, n_timesteps=2
    )
    assert len(paths) == 5
    names = sorted(str(p).split("/")[-1] for p in paths)
    assert names == [f"utt{i:03d}.npy" for i in range(5)]
    for p in paths:
        arr = np.load(p)
        assert arr.shape[0] == 29
        assert np.isfinite(arr).all()


def test_batched_ms_inference_with_durations(tmp_path, rng):
    """Batched serving for the aligned-input (v6) family: durations drive the
    bucket and alignment."""
    from arttts_tpu.core.config import get_preset
    import dataclasses as _dc

    base = get_preset("v6")
    cfg = _dc.replace(
        base,
        model=_dc.replace(
            base.model,
            encoder=_dc.replace(
                base.model.encoder, n_channels=16, filter_channels=32,
                filter_channels_dp=16, n_layers=1,
            ),
            decoder=_dc.replace(base.model.decoder, dim=8, masked_norm=True),
        ),
    )

    class DS:
        manifest = [(f"cv_x_ab_{i:03d}", None) for i in range(3)]

        def __len__(self):
            return 3

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            T = 5 + i
            x = r.integers(-1, 2, size=(T, 26)).astype(np.float32)
            d = r.integers(2, 6, size=T).astype(np.float32)
            x[:, 25] = d
            return {"x": x, "spk": r.standard_normal(1024).astype(np.float32),
                    "durations": d}

    model = GradTTSModel(config=cfg.model)
    ds = DS()
    item = ds[0]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(item["x"])[None], jnp.array([5]),
        jnp.zeros((1, 32, 16)), jnp.ones((1, 32, 1)), jnp.zeros((1,)),
        jnp.asarray(item["spk"])[None],
    )
    paths = run_acoustic_inference_batched(
        cfg, variables, ds, str(tmp_path / "p"), batch_size=2, n_timesteps=2
    )
    assert len(paths) == 3
    for i, p in enumerate(sorted(paths)):
        arr = np.load(p)
        assert arr.shape[0] == 29
        d = ds[i]["durations"]
        assert arr.shape[1] == int(np.ceil(d).sum())
