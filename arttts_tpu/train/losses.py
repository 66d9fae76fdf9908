"""Training losses for the Grad-TTS model family (pure functions).

Equivalent of `ArtTTS.compute_loss` (`/root/reference/src/model/tts.py:
167-280`) and `GradTTArtic.compute_loss` (`model_ms/tts.py:169-262`), jitted
end-to-end on TPU: MAS runs *inside* the step (no host round trip,
cf. tts.py:212's device boundary), and the random 2-second segment cut is
`jax.random` + per-sample `dynamic_slice` with a static `out_size` instead of
a host Python loop (tts.py:224-264).

Batch layout: x `(B, T_x, C_in)` or `(B, T_x)` ids; y `(B, T_y, n_feats)`;
masks derived from lengths.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from arttts_tpu.models.diffusion_sde import (
    diffusion_loss_from_estimate,
    forward_diffusion,
    sample_t,
)
from arttts_tpu.ops.mas import maximum_path
from arttts_tpu.ops.shape import duration_loss, sequence_mask


def mas_log_prior(mu_x, y, x_mask, y_mask):
    """Gaussian log-prior matrix for MAS (tts.py:200-210).

    mu_x: (B, T_x, C); y: (B, T_y, C). Returns (B, T_x, T_y) and the
    (B, T_x, T_y) attention mask.
    """
    n_feats = mu_x.shape[-1]
    const = -0.5 * math.log(2 * math.pi) * n_feats
    y_sq = -0.5 * jnp.einsum("bjc->bj", y**2)[:, None, :]  # (B, 1, T_y)
    y_mu = jnp.einsum("bic,bjc->bij", mu_x, y)  # (B, T_x, T_y)
    mu_sq = -0.5 * jnp.sum(mu_x**2, axis=-1)[:, :, None]  # (B, T_x, 1)
    log_prior = y_sq + y_mu + mu_sq + const
    attn_mask = x_mask[:, :, 0:1] * y_mask[:, None, :, 0]  # (B, T_x, T_y)
    return log_prior, attn_mask


def cut_segments(rng, y, attn, y_lengths, out_size: int, offsets=None):
    """Random fixed-size decoder segments (tts.py:224-264).

    y: (B, T_y, C); attn: (B, T_x, T_y). T_y must be >= out_size (the data
    layer pads batches accordingly). `offsets` overrides the random draw
    (convergence-parity tests pin it; `rng` may then be None).
    Returns (y_cut, attn_cut, y_cut_mask).
    """
    B, T_y, _ = y.shape
    max_offset = jnp.maximum(y_lengths - out_size, 0)  # (B,)
    if offsets is None:
        u = jax.random.uniform(rng, (B,))
        # uniform int in [0, max_offset); 0 when max_offset == 0
        offsets = jnp.floor(u * max_offset.astype(u.dtype)).astype(jnp.int32)
    else:
        offsets = jnp.asarray(offsets, jnp.int32)

    def cut_one(y_b, attn_b, off):
        y_c = jax.lax.dynamic_slice_in_dim(y_b, off, out_size, axis=0)
        a_c = jax.lax.dynamic_slice_in_dim(attn_b, off, out_size, axis=1)
        return y_c, a_c

    y_cut, attn_cut = jax.vmap(cut_one)(y, attn, offsets)
    y_cut_lengths = jnp.minimum(y_lengths, out_size)
    y_cut_mask = sequence_mask(y_cut_lengths, out_size).astype(y.dtype)[:, :, None]
    return y_cut * y_cut_mask, attn_cut * y_cut_mask[:, None, :, 0], y_cut_mask


def prior_loss_fn(y, mu_y, y_mask, n_feats: int):
    """Gaussian prior NLL (tts.py:277-278)."""
    loss = jnp.sum(0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * y_mask)
    return loss / (jnp.sum(y_mask) * n_feats)


def grad_tts_loss(
    model,
    variables,
    rng,
    x,
    x_lengths,
    y,
    y_lengths,
    spk=None,
    durations=None,  # unused; uniform signature with grad_ttartic_loss
    out_size: Optional[int] = None,
    train: bool = True,
    pinned=None,
):
    """Full three-part loss: (dur, prior, diff) like tts.py:167-280.

    `pinned` is an optional `(t, z, offsets)` triple overriding the three
    stochastic draws (diffusion time, diffusion noise, segment offsets) —
    used by the convergence-parity study to feed both frameworks the exact
    same randomness (tts.py:226-235 `random.choice`, diffusion.py `torch.rand`
    / `torch.randn`).

    Returns (total, dict of parts)."""
    t_pin = z_pin = off_pin = None
    if pinned is not None:
        t_pin, z_pin, off_pin = pinned
    rng_drop, rng_t, rng_z, rng_seg = jax.random.split(rng, 4)
    n_feats = model.config.n_feats
    dec = model.config.decoder

    mu_x, logw, x_mask = model.apply(
        variables,
        x,
        x_lengths,
        spk,
        deterministic=not train,
        method="encode",
        rngs={"dropout": rng_drop} if train else {},
    )
    T_y = y.shape[1]
    y_mask = sequence_mask(y_lengths, T_y).astype(mu_x.dtype)[:, :, None]

    # --- MAS (stop-gradient, in-graph) ------------------------------------
    log_prior, attn_mask = mas_log_prior(
        jax.lax.stop_gradient(mu_x), y, x_mask, y_mask
    )
    attn = maximum_path(log_prior, attn_mask)  # (B, T_x, T_y)
    attn = jax.lax.stop_gradient(attn)

    # --- duration loss ----------------------------------------------------
    logw_hat = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[:, :, None] * x_mask
    dur = duration_loss(logw, logw_hat, x_lengths)

    # --- segment cut ------------------------------------------------------
    if out_size is not None:
        y_seg, attn_seg, y_seg_mask = cut_segments(
            rng_seg, y, attn, y_lengths, out_size, offsets=off_pin
        )
    else:
        y_seg, attn_seg, y_seg_mask = y, attn, y_mask

    # --- aligned prior ----------------------------------------------------
    mu_y = jnp.einsum("bij,bic->bjc", attn_seg, mu_x)  # (B, T_seg, C)

    # --- diffusion loss ---------------------------------------------------
    t = sample_t(rng_t, y.shape[0], dtype=mu_x.dtype) if t_pin is None else t_pin
    xt, z = forward_diffusion(
        rng_z, y_seg, y_seg_mask, mu_y, t, dec.beta_min, dec.beta_max, z=z_pin
    )
    noise_est = model.apply(
        variables,
        xt,
        y_seg_mask,
        mu_y,
        t,
        spk,
        method="estimate_noise",
    )
    diff = diffusion_loss_from_estimate(
        noise_est, z, y_seg_mask, t, n_feats, dec.beta_min, dec.beta_max
    )

    prior = prior_loss_fn(y_seg, mu_y, y_seg_mask, n_feats)

    total = dur + prior + diff
    return total, {"dur_loss": dur, "prior_loss": prior, "diff_loss": diff}


def grad_ttartic_loss(
    model,
    variables,
    rng,
    x,
    x_lengths,
    y,
    y_lengths,
    spk=None,
    durations=None,
    out_size: Optional[int] = None,
    train: bool = True,
    pinned=None,
):
    """Aligned-input multi-speaker loss (model_ms/tts.py:169-262): durations
    come from forced alignments (input channel 26), so there is no MAS and no
    duration loss — only (prior, diff). `pinned` as in `grad_tts_loss`."""
    from arttts_tpu.ops.shape import generate_path

    t_pin = z_pin = off_pin = None
    if pinned is not None:
        t_pin, z_pin, off_pin = pinned
    rng_drop, rng_t, rng_z, rng_seg = jax.random.split(rng, 4)
    n_feats = model.config.n_feats
    dec = model.config.decoder

    assert durations is not None, "grad_ttartic_loss needs aligned durations"
    mu_x, _, x_mask = model.apply(
        variables,
        x,
        x_lengths,
        spk,
        deterministic=not train,
        method="encode",
        rngs={"dropout": rng_drop} if train else {},
    )
    T_y = y.shape[1]
    y_mask = sequence_mask(y_lengths, T_y).astype(mu_x.dtype)[:, :, None]
    attn_mask = x_mask[:, :, 0:1] * y_mask[:, None, :, 0]
    attn = generate_path(durations, attn_mask)

    if out_size is not None:
        y_seg, attn_seg, y_seg_mask = cut_segments(
            rng_seg, y, attn, y_lengths, out_size, offsets=off_pin
        )
    else:
        y_seg, attn_seg, y_seg_mask = y, attn, y_mask

    mu_y = jnp.einsum("bij,bic->bjc", attn_seg, mu_x)

    t = sample_t(rng_t, y.shape[0], dtype=mu_x.dtype) if t_pin is None else t_pin
    xt, z = forward_diffusion(
        rng_z, y_seg, y_seg_mask, mu_y, t, dec.beta_min, dec.beta_max, z=z_pin
    )
    noise_est = model.apply(
        variables, xt, y_seg_mask, mu_y, t, spk, method="estimate_noise"
    )
    diff = diffusion_loss_from_estimate(
        noise_est, z, y_seg_mask, t, n_feats, dec.beta_min, dec.beta_max
    )
    prior = prior_loss_fn(y_seg, mu_y, y_seg_mask, n_feats)
    total = prior + diff
    return total, {"prior_loss": prior, "diff_loss": diff}


def loss_for_model(name: str):
    """Loss callable for a model family (uniform signature)."""
    return grad_ttartic_loss if name == "grad_ttartic" else grad_tts_loss
