"""Masked GroupNorm: padded batched forwards must equal per-sample
unpadded forwards (unlocking batched inference; the reference is pinned to
batch size 1 by GroupNorm padding leakage, arttts_inference.py:227-231)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.ops.shape import sequence_mask
from tests.test_model import tiny_config


def test_masked_groupnorm_padding_exactness(rng):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, masked_norm=True)
    )
    model = GradTTSModel(config=cfg)

    T_full, T_short = 48, 32  # both U-Net compatible (mult of 4)
    B = 2
    y = rng.standard_normal((B, T_full, cfg.n_feats)).astype(np.float32)
    mu = rng.standard_normal((B, T_full, cfg.n_feats)).astype(np.float32)
    y[1, T_short:] = 0.0
    mu[1, T_short:] = 0.0
    lengths = jnp.array([T_full, T_short])
    mask = sequence_mask(lengths, T_full).astype(np.float32)[:, :, None]
    t = jnp.array([0.4, 0.7])

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(-1, 2, (B, 7, 25)).astype(np.float32))
    variables = model.init(
        {"params": key, "dropout": key},
        x,
        jnp.array([7, 7]),
        jnp.asarray(y),
        jnp.asarray(mask),
        t,
    )

    batched = model.apply(
        variables, jnp.asarray(y), jnp.asarray(mask), jnp.asarray(mu), t,
        method="estimate_noise",
    )
    # run sample 1 alone at its exact length
    solo = model.apply(
        variables,
        jnp.asarray(y[1:2, :T_short]),
        jnp.ones((1, T_short, 1)),
        jnp.asarray(mu[1:2, :T_short]),
        t[1:2],
        method="estimate_noise",
    )
    np.testing.assert_allclose(
        np.asarray(batched)[1, :T_short], np.asarray(solo)[0], atol=2e-4
    )
    # padding region is zeroed
    assert np.abs(np.asarray(batched)[1, T_short:]).max() == 0.0


def test_unmasked_groupnorm_leaks_padding(rng):
    """Sanity: with plain GroupNorm the same comparison must NOT match —
    this is exactly the reference's B=1 caveat."""
    cfg = tiny_config()
    model = GradTTSModel(config=cfg)
    T_full, T_short, B = 48, 32, 2
    y = rng.standard_normal((B, T_full, cfg.n_feats)).astype(np.float32)
    mu = rng.standard_normal((B, T_full, cfg.n_feats)).astype(np.float32)
    y[1, T_short:] = 0.0
    mu[1, T_short:] = 0.0
    mask = sequence_mask(jnp.array([T_full, T_short]), T_full).astype(np.float32)[
        :, :, None
    ]
    t = jnp.array([0.4, 0.7])
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(-1, 2, (B, 7, 25)).astype(np.float32))
    variables = model.init(
        {"params": key, "dropout": key}, x, jnp.array([7, 7]),
        jnp.asarray(y), jnp.asarray(mask), t,
    )
    batched = model.apply(
        variables, jnp.asarray(y), jnp.asarray(mask), jnp.asarray(mu), t,
        method="estimate_noise",
    )
    solo = model.apply(
        variables, jnp.asarray(y[1:2, :T_short]), jnp.ones((1, T_short, 1)),
        jnp.asarray(mu[1:2, :T_short]), t[1:2], method="estimate_noise",
    )
    diff = np.abs(np.asarray(batched)[1, :T_short] - np.asarray(solo)[0]).max()
    assert diff > 1e-3  # padding leaked through the norm, as in the reference
