"""Heun (2nd-order) probability-flow sampler: must converge to the same ODE
solution as fine-grained Euler, with fewer steps than coarse Euler."""

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.infer.sampler import reverse_diffusion, reverse_diffusion_heun
from arttts_tpu.models.tts import GradTTSModel
from tests.test_model import make_batch, tiny_config


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
