"""Sampler helper tests: frame bucketing, duration-only forward, duration
override parity with generate_path semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.infer.sampler import frame_bucket, predict_lengths, synthesize
from tests.test_model import make_batch, tiny_config
from arttts_tpu.models.tts import GradTTSModel


def test_frame_bucket():
    assert frame_bucket(100) == 128
    assert frame_bucket(128) == 128
    assert frame_bucket(129) == 256
    assert frame_bucket(5000) == 5000  # beyond buckets: rounded to mult of 4


def test_predict_lengths_and_duration_override(rng):
    cfg = tiny_config()
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, _ = make_batch(rng, cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((y.shape[0], y.shape[1], 1)), jnp.zeros((2,)),
    )
    w = predict_lengths(model, variables, x, x_lengths)
    assert w.shape == (2, x.shape[1], 1)
    assert (np.asarray(w) >= 0).all()  # exp(logw) * mask

    # ground-truth durations drive y_lengths exactly (use_align inference)
    durations = jnp.asarray(
        rng.integers(1, 3, size=(2, x.shape[1])).astype(np.float32)
    )
    enc, dec, attn, y_len = synthesize(
        model, variables, key, x, x_lengths,
        n_timesteps=2, max_frames=64, x_durations=durations,
    )
    x_mask = np.arange(x.shape[1])[None, :] < np.asarray(x_lengths)[:, None]
    expected = (np.asarray(durations) * x_mask).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(y_len), expected.astype(np.int64))
    # alignment durations match the provided ones inside the mask
    np.testing.assert_allclose(
        np.asarray(attn).sum(axis=2) * x_mask, np.asarray(durations) * x_mask
    )


def test_synthesize_to_wav_single_program(rng):
    """End-to-end text->wav in one jitted program."""
    from arttts_tpu.infer.sampler import synthesize_to_wav
    from arttts_tpu.models.hifigan import HiFiGANGenerator

    cfg = tiny_config(kind="text", n_feats=80)
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, _ = make_batch(rng, cfg, T_y=24)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((y.shape[0], y.shape[1], 1)), jnp.zeros((2,)),
    )
    voc = HiFiGANGenerator(
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((2, 32, 80)))
    wav, y_len = synthesize_to_wav(
        model, variables, voc, voc_vars, key, x, x_lengths,
        n_timesteps=2, max_frames=32,
    )
    assert wav.shape == (2, 32 * 256, 1)
    assert np.isfinite(np.asarray(wav)).all()


def test_serving_split_matches_fused(rng):
    """encode_text + synthesize_from_encoding == synthesize (same rng), and
    serve_text_to_wav runs the two-dispatch request path end to end."""
    from arttts_tpu.infer.sampler import (
        encode_text,
        serve_text_to_wav,
        synthesize_from_encoding,
    )
    from arttts_tpu.models.hifigan import HiFiGANGenerator

    cfg = tiny_config(kind="text", n_feats=80)
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, _ = make_batch(rng, cfg, T_y=24)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((y.shape[0], y.shape[1], 1)), jnp.zeros((2,)),
    )
    mu_x, logw, x_mask, pred = encode_text(model, variables, x, x_lengths)
    # pred_frames == sum of ceil(exp(logw)) inside the mask
    w = np.exp(np.asarray(logw)) * np.asarray(x_mask)
    np.testing.assert_allclose(
        np.asarray(pred), np.ceil(w).sum(axis=(1, 2)), rtol=1e-6
    )
    enc_a, dec_a, attn_a, ylen_a = synthesize_from_encoding(
        model, variables, key, mu_x, logw, x_mask, n_timesteps=2, max_frames=32
    )
    enc_b, dec_b, attn_b, ylen_b = synthesize(
        model, variables, key, x, x_lengths, n_timesteps=2, max_frames=32
    )
    np.testing.assert_array_equal(np.asarray(ylen_a), np.asarray(ylen_b))
    np.testing.assert_allclose(
        np.asarray(dec_a), np.asarray(dec_b), atol=1e-5
    )

    voc = HiFiGANGenerator(
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((2, 32, 80)))
    wav, y_len, bucket = serve_text_to_wav(
        model, variables, voc, voc_vars, key, x, x_lengths, n_timesteps=2
    )
    assert bucket in (128, 256, 384, 512, 768, 1024) or bucket % 4 == 0
    assert wav.shape == (2, bucket * 256, 1)
    assert np.isfinite(np.asarray(wav)).all()
    assert int(np.asarray(y_len).max()) <= bucket


def test_stochastic_sampler_path(rng):
    """stoc=True adds per-step noise; runs and differs from the ODE path."""
    from arttts_tpu.infer.sampler import reverse_diffusion

    cfg = tiny_config()
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, _ = make_batch(rng, cfg, T_y=16)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y[:, :16], jnp.ones((2, 16, 1)), jnp.zeros((2,)),
    )
    mask = jnp.ones((2, 16, cfg.n_feats))[:, :, :1]
    mu = jnp.asarray(np.asarray(y[:, :16]) * 0.2)
    z = mu + 0.1
    det = reverse_diffusion(model, variables, z, mask, mu, 3, stoc=False)
    sto = reverse_diffusion(
        model, variables, z, mask, mu, 3, stoc=True, rng=jax.random.PRNGKey(5)
    )
    assert np.isfinite(np.asarray(sto)).all()
    assert not np.allclose(np.asarray(det), np.asarray(sto))
