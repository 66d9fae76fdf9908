"""bf16 serving path (`DecoderConfig.compute_dtype`) consistency.

Params stay f32 (identical tree/checkpoints); activations run bf16 with all
normalization statistics and the sinusoidal time phases in f32
(`unet2d.py`). The bf16 estimator must track the f32 one within bf16
accumulation tolerance — this pins the numerics contract the TPU serving
config relies on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.core.config import get_preset
from arttts_tpu.models.tts import GradTTSModel


def _models():
    cfg = get_preset("v2").model
    cfg16 = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, compute_dtype="bfloat16")
    )
    return GradTTSModel(config=cfg), GradTTSModel(config=cfg16)


def test_bf16_estimator_tracks_f32(rng):
    m32, m16 = _models()
    key = jax.random.PRNGKey(0)
    B, T, F = 2, 64, 80
    x = jnp.asarray(rng.integers(1, 149, (B, 24)))
    xl = jnp.array([24, 20])
    v = jax.jit(m32.init)(
        {"params": key, "dropout": key}, x, xl,
        jnp.zeros((B, T, F)), jnp.ones((B, T, 1)), jnp.zeros((B,)),
    )
    # same params usable by both dtypes: tree structures must be identical
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        jax.jit(m16.init)(
            {"params": key, "dropout": key}, x, xl,
            jnp.zeros((B, T, F)), jnp.ones((B, T, 1)), jnp.zeros((B,)),
        )
    )
    xt = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T, 1))
    t = jnp.array([0.3, 0.8])
    o32 = m32.apply(v, xt, mask, mu, t, method="estimate_noise")
    o16 = m16.apply(v, xt, mask, mu, t, method="estimate_noise")
    assert o16.dtype == jnp.float32  # cast back at the boundary
    rel = float(jnp.linalg.norm(o16 - o32) / jnp.linalg.norm(o32))
    # measured 0.0104 at these sizes; the time-embedding-in-bf16 bug this
    # test guards against produced 0.18
    assert rel < 0.03, f"bf16 path rel err {rel:.4f}"


def test_bf16_masked_norm_tracks_f32(rng):
    """Masked GroupNorm stats stay f32: padded batched bf16 forward must
    agree with itself under different padding (the batched-serving
    invariant) at bf16 tolerance."""
    cfg = get_preset("v2").model
    cfg16 = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, compute_dtype="bfloat16", masked_norm=True
        ),
    )
    m = GradTTSModel(config=cfg16)
    key = jax.random.PRNGKey(1)
    B, T, F = 1, 32, 80
    x = jnp.asarray(rng.integers(1, 149, (B, 12)))
    xl = jnp.array([12])
    v = jax.jit(m.init)(
        {"params": key, "dropout": key}, x, xl,
        jnp.zeros((B, T, F)), jnp.ones((B, T, 1)), jnp.zeros((B,)),
    )
    xt = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T, 1))
    t = jnp.array([0.5])
    out = m.apply(v, xt, mask, mu, t, method="estimate_noise")
    # pad to 2x frames with zeros: valid region must be (near-)unchanged
    def pad(a):
        return jnp.pad(a, ((0, 0), (0, T), (0, 0)))

    out_p = m.apply(
        v, pad(xt), pad(mask), pad(mu), t, method="estimate_noise"
    )
    rel = float(
        jnp.linalg.norm(out_p[:, :T] - out) / jnp.linalg.norm(out)
    )
    assert rel < 0.02, f"padded bf16 masked-norm rel err {rel:.4f}"
