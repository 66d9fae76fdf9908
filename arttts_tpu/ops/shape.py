"""Shape/mask utilities shared by every model in the framework.

Functional equivalents of the reference helpers at
`/root/reference/src/model/utils.py:6-48` (sequence_mask, fix_len_compatibility,
generate_path, duration_loss), written for static-shape XLA programs: every
function takes an explicit `max_length` so jit traces a single shape.

Layout convention: time-major-last features, i.e. sequences are `(B, T, C)` and
masks are `(B, T)` float/bool. (The torch reference uses `(B, C, T)`; we keep
features last because XLA maps the last dimension onto TPU lanes.)
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """`(B,) int -> (B, max_length) bool`; True where index < length.

    Ref parity: `model/utils.py:6-10`, but `max_length` is mandatory (static).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round `length` up to a multiple of 2**num_downsamplings (U-Net compat).

    Ref parity: `model/utils.py:13-17`. Python-level (static shapes only).
    """
    factor = 2**num_downsamplings_in_unet
    return ((int(length) + factor - 1) // factor) * factor


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Expand integer durations into a binary monotonic alignment path.

    duration: `(B, T_x)` (float or int) per-token frame counts.
    mask:     `(B, T_x, T_y)` attention mask.
    returns:  `(B, T_x, T_y)` 0/1 path; row i covers frames
              [cum_dur[i-1], cum_dur[i]).

    Ref parity: `model/utils.py:26-43` (cumsum + shifted-mask difference).
    """
    b, t_x = duration.shape
    t_y = mask.shape[-1]
    cum_duration = jnp.cumsum(duration, axis=1)  # (B, T_x)
    pos = jnp.arange(t_y, dtype=cum_duration.dtype)  # (T_y,)
    # path[b, i, j] = j < cum_dur[b, i]
    path = (pos[None, None, :] < cum_duration[:, :, None]).astype(mask.dtype)
    # subtract the previous row's coverage to get the exclusive band
    prev = jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (path - prev) * mask


def duration_loss(
    logw: jnp.ndarray, logw_hat: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """MSE between log-durations, normalized by total token count.

    Ref parity: `model/utils.py:46-48`.
    """
    return jnp.sum((logw - logw_hat) ** 2) / jnp.sum(lengths)
