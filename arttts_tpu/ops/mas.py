"""Monotonic Alignment Search (MAS) — TPU-native implementation.

The reference implements MAS as a Cython/OpenMP kernel
(`/root/reference/src/model/monotonic_align/core.pyx:9-45`) that runs on host,
forcing a GPU->CPU->GPU round trip every training step
(`model/monotonic_align/__init__.py:8-23`). Here the same DP runs *inside* the
jitted training step:

- the forward max-accumulation is a single `lax.scan` over the frame axis whose
  per-step body is one vectorized `(B, T_x)` column update (the DP recurrence
  for column `y` only reads column `y-1`, so the whole column — and the whole
  batch — updates in parallel on the VPU);
- the backtrace decisions are precomputed as one vectorized comparison tensor,
  so the sequential backtrace scan only gathers one scalar per (sample, frame).

Semantics match the reference exactly, including the band constraint
(`x == y -> max_neg_val`), the `x == 0` boundary rules, and the tie-breaking of
the backtrace (`core.pyx:18-35`). `mas_reference_numpy` is a direct NumPy
transcription of that DP used as the golden oracle in tests.

A Pallas TPU kernel (`mas_pallas`) with identical math is provided for the
single-chip hot path; `maximum_path` picks the backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_NEG_VAL = -1e9


# ---------------------------------------------------------------------------
# Golden oracle (host, NumPy) — mirrors core.pyx semantics for parity testing.
# ---------------------------------------------------------------------------
def mas_reference_numpy(
    value: np.ndarray,
    t_xs: np.ndarray,
    t_ys: np.ndarray,
    max_neg_val: float = MAX_NEG_VAL,
) -> np.ndarray:
    """Batched Viterbi-style MAS on host. value: (B, T_x, T_y) float32.

    Returns int32 paths (B, T_x, T_y). Mutates a copy of `value`.
    """
    value = value.astype(np.float32).copy()
    b, T_x, T_y = value.shape
    paths = np.zeros((b, T_x, T_y), dtype=np.int32)
    for i in range(b):
        t_x, t_y = int(t_xs[i]), int(t_ys[i])
        v = value[i]
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = max_neg_val if x == y else v[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else max_neg_val
                else:
                    v_prev = v[x - 1, y - 1]
                v[x, y] = max(v_cur, v_prev) + v[x, y]
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, index, y] = 1
            if index != 0 and (
                index == y or v[index, y - 1] < v[index - 1, y - 1]
            ):
                index -= 1
    return paths


# ---------------------------------------------------------------------------
# JAX column-scan implementation (works on CPU/TPU, fully jittable).
# ---------------------------------------------------------------------------
def _mas_forward_scan(value, t_xs, t_ys, max_neg_val):
    """DP forward pass. value: (B, T_x, T_y) -> accumulated values, same shape."""
    B, T_x, T_y = value.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)[None, :]  # (1, T_x)
    t_x = t_xs[:, None].astype(jnp.int32)  # (B, 1)
    t_y = t_ys[:, None].astype(jnp.int32)  # (B, 1)

    value_t = jnp.moveaxis(value, 2, 0)  # (T_y, B, T_x)
    ys = jnp.arange(T_y, dtype=jnp.int32)

    def step(prev_col, inputs):
        y, v_in = inputs  # scalar, (B, T_x)
        in_band = (xs >= jnp.maximum(0, t_x + y - t_y)) & (
            xs < jnp.minimum(t_x, y + 1)
        )
        v_cur = jnp.where(xs == y, max_neg_val, prev_col)
        shifted = jnp.concatenate(
            [jnp.full((B, 1), max_neg_val, prev_col.dtype), prev_col[:, :-1]],
            axis=1,
        )
        v_prev = jnp.where(
            xs == 0,
            jnp.where(y == 0, 0.0, max_neg_val),
            shifted,
        )
        new_col = jnp.where(in_band, jnp.maximum(v_cur, v_prev) + v_in, v_in)
        return new_col, new_col

    init = jnp.zeros((B, T_x), value.dtype)
    _, cols = jax.lax.scan(step, init, (ys, value_t))
    return jnp.moveaxis(cols, 0, 2)  # (B, T_x, T_y)


def _mas_backtrace(value_dp, t_xs, t_ys):
    """Backtrace over accumulated DP values -> 0/1 path (B, T_x, T_y)."""
    B, T_x, T_y = value_dp.shape
    t_x = t_xs.astype(jnp.int32)
    t_y = t_ys.astype(jnp.int32)

    # Decision tensor: dec[b, x, y] == True -> step from (x, y) to (x-1, y-1).
    # Mirrors `core.pyx:34`: index != 0 and (index == y or
    #                                        v[index, y-1] < v[index-1, y-1]).
    xs = jnp.arange(T_x, dtype=jnp.int32)[None, :, None]  # (1, T_x, 1)
    ys = jnp.arange(T_y, dtype=jnp.int32)[None, None, :]  # (1, 1, T_y)
    v_prev_col = jnp.pad(value_dp, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    v_prev_col_up = jnp.pad(value_dp, ((0, 0), (1, 0), (1, 0)))[:, :-1, :-1]
    less = v_prev_col < v_prev_col_up  # v[x, y-1] < v[x-1, y-1]
    dec = (xs != 0) & ((xs == ys) | ((ys > 0) & less))  # (B, T_x, T_y)

    def step(index, y):
        active = y < t_y  # (B,)
        emit = jnp.where(active, index, -1)
        d = jax.vmap(lambda db, idx: db[idx, y])(dec, index)  # (B,) scalar gathers
        index = jnp.where(active & d, index - 1, index)
        return index, emit

    init_index = jnp.maximum(t_x - 1, 0)
    ys_desc = jnp.arange(T_y - 1, -1, -1, dtype=jnp.int32)
    _, emitted = jax.lax.scan(step, init_index, ys_desc)
    # emitted: (T_y, B) with -1 for inactive steps; reorder to ascending y.
    indices = emitted[::-1].T  # (B, T_y)
    path = (jnp.arange(T_x, dtype=jnp.int32)[None, :, None] == indices[:, None, :])
    return path


@functools.partial(jax.jit, static_argnames=("max_neg_val",))
def mas_scan(value, t_xs, t_ys, max_neg_val: float = MAX_NEG_VAL):
    """MAS via lax.scan. value: (B, T_x, T_y) masked log-prior. Returns float path."""
    value_dp = _mas_forward_scan(value, t_xs, t_ys, max_neg_val)
    path = _mas_backtrace(value_dp, t_xs, t_ys)
    return path.astype(value.dtype)


def maximum_path(
    value: jnp.ndarray, mask: jnp.ndarray, backend: str | None = None
) -> jnp.ndarray:
    """Drop-in equivalent of the reference wrapper
    (`model/monotonic_align/__init__.py:8-23`): masks the log-prior, derives
    per-sample (t_x, t_y) from the mask, runs the DP, returns a float path.

    value: (B, T_x, T_y) log-prior; mask: (B, T_x, T_y) 0/1.
    backend: "pallas" (TPU kernel) | "scan" (portable); auto-selected from
    the active JAX backend when None (env ARTTTS_MAS_BACKEND overrides, e.g.
    to force the pallas path in interpret mode on a CPU mesh for multi-chip
    dryruns). The pallas kernel carries a GSPMD batch-sharding rule, so it
    partitions cleanly inside a mesh-sharded train step.
    """
    import os

    value = value * mask
    t_xs = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)
    if backend is None:
        backend = os.environ.get("ARTTTS_MAS_BACKEND") or (
            "scan" if jax.default_backend() == "cpu" else "pallas"
        )
    if backend == "pallas":
        # the kernel keeps ~4 whole (T_y, B, T_x) f32 buffers in VMEM;
        # beyond the ~100 MiB ceiling (v5e physical probed >= 96 MiB) the
        # compile cannot fit — route huge batch x length products to the
        # portable scan instead of failing (r5: v1 recipe at B=32 needed
        # 24 MiB > the 16 MiB default; B=64-scale would exceed physical)
        B, T_x, T_y = value.shape
        if 4 * B * T_x * T_y * 4 + (8 << 20) > (100 << 20):
            backend = "scan"
    if backend == "pallas":
        from arttts_tpu.ops.mas_pallas import mas_pallas

        interpret = jax.default_backend() == "cpu"
        path = mas_pallas(value.astype(jnp.float32), t_xs, t_ys, interpret=interpret)
    else:
        path = mas_scan(value.astype(jnp.float32), t_xs, t_ys)
    return path.astype(value.dtype)
