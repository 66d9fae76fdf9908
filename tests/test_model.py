"""Model-layer tests: init, loss computation, sampling, mask invariance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig
from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.train.losses import grad_tts_loss
from arttts_tpu.infer.sampler import synthesize


def tiny_config(kind="ipa_trait", decoder="unet2d", n_feats=16):
    enc = EncoderConfig(
        kind=kind,
        n_vocab=50 if kind == "text" else 0,
        n_input_feats=25,
        n_channels=32,
        filter_channels=64,
        filter_channels_dp=32,
        n_heads=1,
        n_layers=2,
        window_size=4,
    )
    dec = DecoderConfig(kind=decoder, dim=16)
    return ModelConfig(
        name="art_tts", n_feats=n_feats, encoder=enc, decoder=dec
    )


def make_batch(rng, cfg, B=2, T_x=11, T_y=40):
    if cfg.encoder.kind == "text":
        x = jnp.asarray(rng.integers(1, cfg.encoder.n_vocab, size=(B, T_x)))
    else:
        x = jnp.asarray(
            rng.integers(-1, 2, size=(B, T_x, cfg.encoder.n_input_feats)).astype(
                np.float32
            )
        )
    x_lengths = jnp.array([T_x, T_x - 4], dtype=jnp.int32)
    y_np = rng.standard_normal((B, T_y, cfg.n_feats)).astype(np.float32)
    y_lengths = jnp.array([T_y, T_y - 12], dtype=jnp.int32)
    # zero out padding like the data layer does
    y_np[1, T_y - 12 :] = 0.0
    if cfg.encoder.kind != "text":
        x_np = np.asarray(x).copy()
        x_np[1, T_x - 4 :] = 0.0
        x = jnp.asarray(x_np)
    return x, x_lengths, jnp.asarray(y_np), y_lengths


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model = GradTTSModel(config=cfg)
    rng = np.random.default_rng(0)
    x, x_lengths, y, y_lengths = make_batch(rng, cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x,
        x_lengths,
        y,
        jnp.ones((y.shape[0], y.shape[1], 1)),
        jnp.zeros((y.shape[0],)),
    )
    return cfg, model, variables


def test_loss_finite(model_and_vars, rng):
    cfg, model, variables = model_and_vars
    x, x_lengths, y, y_lengths = make_batch(rng, cfg)
    total, parts = grad_tts_loss(
        model,
        variables,
        jax.random.PRNGKey(1),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=16,
    )
    assert np.isfinite(float(total))
    assert set(parts) == {"dur_loss", "prior_loss", "diff_loss"}
    for v in parts.values():
        assert np.isfinite(float(v))


def test_loss_padding_invariance(model_and_vars, rng):
    """Changing content in padded regions must not change the loss."""
    cfg, model, variables = model_and_vars
    x, x_lengths, y, y_lengths = make_batch(rng, cfg)
    key = jax.random.PRNGKey(2)
    total1, _ = grad_tts_loss(
        model, variables, key, x, x_lengths, y, y_lengths, out_size=None, train=False
    )
    # poison the padding
    y2 = np.asarray(y).copy()
    y2[1, int(y_lengths[1]) :] = 1000.0
    x2 = np.asarray(x).copy()
    x2[1, int(x_lengths[1]) :] = -1000.0
    total2, _ = grad_tts_loss(
        model,
        variables,
        key,
        jnp.asarray(x2),
        x_lengths,
        jnp.asarray(y2),
        y_lengths,
        out_size=None,
        train=False,
    )
    np.testing.assert_allclose(float(total1), float(total2), rtol=1e-4)


def test_synthesize_shapes(model_and_vars, rng):
    cfg, model, variables = model_and_vars
    x, x_lengths, _, _ = make_batch(rng, cfg)
    enc, dec, attn, y_lengths = synthesize(
        model,
        variables,
        jax.random.PRNGKey(3),
        x,
        x_lengths,
        n_timesteps=4,
        max_frames=64,
    )
    B, T_x = x.shape[0], x.shape[1]
    assert enc.shape == (B, 64, cfg.n_feats)
    assert dec.shape == (B, 64, cfg.n_feats)
    assert attn.shape == (B, T_x, 64)
    assert np.isfinite(np.asarray(dec)).all()
    assert (np.asarray(y_lengths) >= 1).all()


def test_text_encoder_variant(rng):
    cfg = tiny_config(kind="text", n_feats=8)
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, y_lengths = make_batch(rng, cfg, T_y=24)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x,
        x_lengths,
        y,
        jnp.ones((y.shape[0], y.shape[1], 1)),
        jnp.zeros((y.shape[0],)),
    )
    total, _ = grad_tts_loss(
        model, variables, key, x, x_lengths, y, y_lengths, out_size=8
    )
    assert np.isfinite(float(total))


def test_unet1d_variants(rng):
    for kind in ["unet1d", "unet1d_preblock"]:
        cfg = tiny_config(decoder=kind)
        model = GradTTSModel(config=cfg)
        x, x_lengths, y, y_lengths = make_batch(rng, cfg)
        key = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": key, "dropout": key},
            x,
            x_lengths,
            y,
            jnp.ones((y.shape[0], y.shape[1], 1)),
            jnp.zeros((y.shape[0],)),
        )
        total, _ = grad_tts_loss(
            model, variables, key, x, x_lengths, y, y_lengths, out_size=16
        )
        assert np.isfinite(float(total))
