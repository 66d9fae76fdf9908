"""Heun (2nd-order) probability-flow sampler: must converge to the same ODE
solution as fine-grained Euler, with fewer steps than coarse Euler."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from arttts_tpu.infer.sampler import reverse_diffusion, reverse_diffusion_heun
from arttts_tpu.models.tts import GradTTSModel
from tests.test_model import make_batch, tiny_config


@pytest.mark.slow
def test_heun_convergence_order(rng):
    cfg = tiny_config()
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, _ = make_batch(rng, cfg, T_y=32)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((y.shape[0], 32, 1)), jnp.zeros((2,)),
    )
    B, T, F = 2, 32, cfg.n_feats
    mask = jnp.ones((B, T, 1))
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)) * 0.3
    z = mu + jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)) * 0.1

    ref = np.asarray(reverse_diffusion(model, variables, z, mask, mu, 400))

    def err(out):
        return float(np.sqrt(np.mean((np.asarray(out) - ref) ** 2)))

    e_euler_10 = err(reverse_diffusion(model, variables, z, mask, mu, 10))
    e_heun_10 = err(reverse_diffusion_heun(model, variables, z, mask, mu, 10))
    e_heun_25 = err(reverse_diffusion_heun(model, variables, z, mask, mu, 25))

    # 2nd order beats 1st order at equal step count
    assert e_heun_10 < e_euler_10, (e_heun_10, e_euler_10)
    # and converges with more steps
    assert e_heun_25 < e_heun_10
    # Heun at 10 steps (20 evals) should at least match Euler at 20 evals
    e_euler_20 = err(reverse_diffusion(model, variables, z, mask, mu, 20))
    assert e_heun_10 < e_euler_20 * 1.5


def test_heun15_quality_gate_vs_euler50(rng):
    """Serving fast-path quality gate (VERDICT r02 #7): the RTF-0.009 claim
    rides on Heun@15 standing in for the reference protocol's Euler@50.
    Pin the end-to-end `synthesize` distance on fixed seeds so the fast
    path cannot silently degrade.

    Measured on this fixed configuration: rel RMSE(heun15, euler50) = 0.120
    vs rel RMSE(euler15, euler50) = 0.419 — gate at <= 0.2 and at < 0.5x
    the Euler@15 error."""
    from arttts_tpu.infer.sampler import synthesize

    cfg = tiny_config(kind="text")
    model = GradTTSModel(config=cfg)
    rng_l = np.random.default_rng(3)
    x, x_lengths, y, _ = make_batch(rng_l, cfg, T_y=40)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((2, 40, 1)), jnp.zeros((2,)),
    )
    k = jax.random.PRNGKey(7)
    dur = jnp.full((2, x.shape[1]), 40 / x.shape[1], jnp.float32)

    def synth(steps, solver):
        _, dec, _, yl = synthesize(
            model, variables, k, x, x_lengths, n_timesteps=steps,
            max_frames=48, x_durations=dur, solver=solver,
        )
        return np.asarray(dec), np.asarray(yl)

    dec50, yl = synth(50, "euler")
    dec15h, _ = synth(15, "heun")
    dec15e, _ = synth(15, "euler")
    mask = (np.arange(48)[None, :, None] < yl[:, None, None]).astype(np.float32)

    def rel_rmse(a, b):
        d = (a - b) * mask
        sig = np.sqrt(((b * mask) ** 2).sum() / mask.sum())
        return float(np.sqrt((d ** 2).sum() / mask.sum()) / sig)

    e_heun = rel_rmse(dec15h, dec50)
    e_euler = rel_rmse(dec15e, dec50)
    assert e_heun <= 0.20, e_heun
    assert e_heun < 0.5 * e_euler, (e_heun, e_euler)
