"""VP-SDE diffusion math (pure functions), ref `model/diffusion.py:255-348`.

Linear noise schedule beta(t) = beta_min + (beta_max - beta_min) * t with
closed-form forward diffusion toward the encoder prior mu. The reverse-SDE
Euler sampler lives in `arttts_tpu/infer/sampler.py` (functional, fori_loop);
the score estimator is a flax submodule of the TTS model.

All tensors are `(B, T, C)` with masks `(B, T, 1)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_noise(t, beta_min: float, beta_max: float, cumulative: bool = False):
    """beta(t), or its integral from 0 to t when cumulative."""
    if cumulative:
        return beta_min * t + 0.5 * (beta_max - beta_min) * (t**2)
    return beta_min + (beta_max - beta_min) * t


def forward_diffusion(rng, x0, mask, mu, t, beta_min: float, beta_max: float,
                      z=None):
    """Closed-form q(x_t | x_0): mean decays x0 toward mu, variance
    1 - exp(-cum_noise) (diffusion.py:287-300).

    `z` overrides the Gaussian draw (convergence-parity tests pin it to the
    reference's draw); `rng` may then be None.

    Returns (xt, z) both masked, shapes like x0.
    """
    time = t[:, None, None]
    cum_noise = get_noise(time, beta_min, beta_max, cumulative=True)
    mean = x0 * jnp.exp(-0.5 * cum_noise) + mu * (1.0 - jnp.exp(-0.5 * cum_noise))
    variance = 1.0 - jnp.exp(-cum_noise)
    if z is None:
        z = jax.random.normal(rng, x0.shape, x0.dtype)
    xt = mean + z * jnp.sqrt(variance)
    return xt * mask, z * mask


def diffusion_loss_from_estimate(noise_estimate, z, mask, t, n_feats: int,
                                 beta_min: float, beta_max: float):
    """Lambda-weighted score-matching loss (diffusion.py:330-341):
    || sqrt(1 - exp(-cum_noise)) * estimator + z ||^2 / (sum(mask) * n_feats).
    """
    time = t[:, None, None]
    cum_noise = get_noise(time, beta_min, beta_max, cumulative=True)
    weighted = noise_estimate * jnp.sqrt(1.0 - jnp.exp(-cum_noise))
    return jnp.sum((weighted + z) ** 2) / (jnp.sum(mask) * n_feats)


def sample_t(rng, batch: int, offset: float = 1e-5, dtype=jnp.float32):
    """t ~ U(0,1) clamped to [offset, 1-offset] (diffusion.py:343-348)."""
    t = jax.random.uniform(rng, (batch,), dtype=dtype)
    return jnp.clip(t, offset, 1.0 - offset)
