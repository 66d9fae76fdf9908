"""Native SPARC encoder tests: contract shapes, frame alignment, masking,
and backbone wiring via the HF WavLM converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.audio.pitch import PitchConfig
from arttts_tpu.models.sparc_encoder import (
    SparcEncoder,
    SparcEncoderConfig,
    build_encoder_params,
    load_probe_npz,
)
from arttts_tpu.models.wavlm import WavLMConfig

SMALL = SparcEncoderConfig(
    wavlm=WavLMConfig(
        conv_layers=((16, 10, 5), (16, 4, 4), (16, 16, 16)),  # stride 320
        hidden_dim=32,
        num_layers=3,
        num_heads=4,
        ffn_dim=64,
        num_buckets=32,
        max_distance=40,
        pos_conv_kernel=16,
        pos_conv_groups=2,
    ),
    tap_layer=2,
)


@pytest.fixture(scope="module")
def enc_and_vars():
    enc = SparcEncoder(SMALL)
    variables = jax.jit(enc.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32)
    )
    return enc, variables


def test_encode_contract_shapes(enc_and_vars, rng):
    """features (B, N, 14) at 50 Hz + spk pre-embedding (B, D) — the
    emasrc/spk_preemb contract of encode_audio_voxcom.py:81-88."""
    enc, variables = enc_and_vars
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    feats, spk = enc.apply(variables, wav)
    n = enc.num_frames(16000)
    assert feats.shape == (2, n, 14)
    assert spk.shape == (2, SMALL.wavlm.hidden_dim)
    assert 48 <= n <= 50  # 1 s of audio at 50 Hz
    assert np.isfinite(np.asarray(feats)).all()


def test_pitch_channel_tracks_tone(enc_and_vars):
    enc, variables = enc_and_vars
    t = np.arange(16000) / 16000.0
    wav = jnp.asarray(np.sin(2 * np.pi * 220.0 * t).astype(np.float32)[None])
    feats, _ = enc.apply(variables, wav)
    f0 = np.asarray(feats)[0, 5:-5, 12]
    assert abs(np.median(f0[f0 > 0]) - 220.0) < 3.0


def test_masked_spk_embedding_ignores_padding(enc_and_vars, rng):
    enc, variables = enc_and_vars
    wav = rng.standard_normal((1, 16000)).astype(np.float32)
    n = enc.num_frames(16000)
    feats_a, spk_a = enc.apply(variables, jnp.asarray(wav))

    wav_pad = np.concatenate([wav, np.zeros((1, 6400), np.float32)], axis=1)
    n_tot = enc.num_frames(16000 + 6400)
    mask = (np.arange(n_tot) < n).astype(np.float32)[None]
    feats_b, spk_b = enc.apply(
        variables, jnp.asarray(wav_pad), frame_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(spk_b), np.asarray(spk_a), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(feats_b)[:, : n - 2, :12],
        np.asarray(feats_a)[:, : n - 2, :12],
        atol=2e-3,
    )


def test_probe_npz_roundtrip(tmp_path, rng):
    d = SMALL.wavlm.hidden_dim
    w = rng.standard_normal((12, d)).astype(np.float32)
    b = rng.standard_normal((12,)).astype(np.float32)
    np.savez(tmp_path / "probe.npz", weight=w, bias=b)
    probe = load_probe_npz(str(tmp_path / "probe.npz"))
    np.testing.assert_allclose(probe["kernel"], w.T)
    np.testing.assert_allclose(probe["bias"], b)


def test_reencode_wavs_roundtrip(tmp_path, enc_and_vars, rng):
    """Self-contained quanti_art re-encoding stage: wav dir -> (T, 14) npys."""
    import scipy.io.wavfile

    from arttts_tpu.eval.quanti import reencode_wavs

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for name in ("a", "b"):
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        scipy.io.wavfile.write(wav_dir / f"{name}.wav", 16000, wav)

    enc, variables = enc_and_vars
    n = reencode_wavs(str(wav_dir), str(tmp_path / "enc"), variables, SMALL)
    assert n == 2
    for name in ("a", "b"):
        arr = np.load(tmp_path / "enc" / f"{name}.npy")
        assert arr.ndim == 2 and arr.shape[1] == 14
        assert 45 <= arr.shape[0] <= 50


def test_full_size_param_structure():
    """WavLM-Large-sized converter output matches SparcEncoder.init's tree
    exactly (shapes + dtypes via eval_shape — no 317M-param compute)."""
    import torch
    from transformers import WavLMModel

    from arttts_tpu.models.wavlm import WavLMConfig
    from arttts_tpu.utils.torch_convert_wavlm import convert_wavlm

    cfg = SparcEncoderConfig()  # WavLM-Large backbone
    enc = SparcEncoder(cfg)
    expected = jax.eval_shape(
        lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    )["params"]

    with torch.device("meta"):
        hf = WavLMModel(WavLMModel.config_class(
            hidden_size=cfg.wavlm.hidden_dim,
            num_hidden_layers=cfg.wavlm.num_layers,
            num_attention_heads=cfg.wavlm.num_heads,
            intermediate_size=cfg.wavlm.ffn_dim,
            conv_dim=[c[0] for c in cfg.wavlm.conv_layers],
            conv_kernel=[c[1] for c in cfg.wavlm.conv_layers],
            conv_stride=[c[2] for c in cfg.wavlm.conv_layers],
            num_feat_extract_layers=len(cfg.wavlm.conv_layers),
            num_conv_pos_embeddings=cfg.wavlm.pos_conv_kernel,
            num_conv_pos_embedding_groups=cfg.wavlm.pos_conv_groups,
            num_buckets=cfg.wavlm.num_buckets,
            max_bucket_distance=cfg.wavlm.max_distance,
            feat_extract_norm=cfg.wavlm.conv_norm,
            conv_bias=cfg.wavlm.conv_bias,
            do_stable_layer_norm=cfg.wavlm.stable_layer_norm,
        ))
    sd = {k: torch.zeros(v.shape) for k, v in hf.state_dict().items()}
    converted = convert_wavlm(sd, cfg.wavlm)

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out["/".join(prefix + (k,))] = v
        return out

    exp_flat = flatten(dict(expected["wavlm"]))
    got_flat = flatten(converted)
    # the tap-layer early exit instantiates only layers 0..tap-1, so the
    # converted full stack is a strict superset (extras are legal in apply
    # and needed when tapping deeper)
    missing = set(exp_flat) - set(got_flat)
    assert not missing, sorted(missing)[:5]
    extras = {k.split("/")[0] for k in set(got_flat) - set(exp_flat)}
    assert all(
        k == "encoder_norm"
        or int(k.removeprefix("layer_")) >= cfg.tap_layer
        for k in extras
    ), sorted(extras)
    for k, v in exp_flat.items():
        assert tuple(np.shape(got_flat[k])) == tuple(v.shape), k


def test_build_params_with_hf_backbone(rng):
    """Full wiring: HF WavLM random weights -> converter -> encoder params;
    the tapped features must match the standalone WavLM module's."""
    import torch
    from transformers import WavLMModel

    from tests.test_wavlm import SMALL_LARGE_STYLE, _hf_config

    cfg = SparcEncoderConfig(wavlm=SMALL_LARGE_STYLE, tap_layer=2)
    torch.manual_seed(0)
    hf = WavLMModel(_hf_config(cfg.wavlm)).eval()
    probe = {
        "kernel": rng.standard_normal((cfg.wavlm.hidden_dim, 12)).astype(np.float32),
        "bias": np.zeros((12,), np.float32),
    }
    variables = build_encoder_params(hf.state_dict(), cfg, probe=probe)
    enc = SparcEncoder(cfg)
    wav = rng.standard_normal((1, 8000)).astype(np.float32)
    feats, _ = enc.apply(variables, jnp.asarray(wav))

    with torch.no_grad():
        hidden = hf(
            torch.from_numpy(wav), output_hidden_states=True
        ).hidden_states[cfg.tap_layer].numpy()
    want = hidden @ probe["kernel"] + probe["bias"]
    np.testing.assert_allclose(
        np.asarray(feats)[..., :12], want[:, : feats.shape[1]], atol=3e-5
    )
