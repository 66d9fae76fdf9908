"""Pallas TPU kernel for Monotonic Alignment Search.

Batch-vectorized single-program design: the log-prior is laid out
`(T_y, B, T_x)` so each DP step updates one `(B, T_x)` tile — batch on
sublanes, text positions on lanes — in a single VPU op chain. The column
recurrence for frame y reads only frame y-1 (`core.pyx:17-30`), so the whole
batch advances together through one `fori_loop` of length T_y; the backtrace
carries a per-sample `(B, 1)` index vector and extracts its decision bit
with a masked lane-reduction, so it is also fully vectorized over the batch.

This removes the reference's GPU->CPU round trip
(`monotonic_align/__init__.py:8-23`) and runs the sequential dimension only
once for the whole batch (the per-sample-grid alternative serializes B
programs). Exactness vs the NumPy/C++ oracles: tests/test_mas_native.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arttts_tpu.ops.mas import MAX_NEG_VAL


def _mas_kernel(value_ref, t_xs_ref, t_ys_ref, path_ref, dp_ref):
    T_y, B, T_x = dp_ref.shape

    xs = jax.lax.broadcasted_iota(jnp.int32, (1, B, T_x), 2)
    t_x = t_xs_ref[:, :][None, :, :]  # (1, B, 1)
    t_y = t_ys_ref[:, :][None, :, :]

    # ---- forward max-accumulation ------------------------------------
    def fwd_body(y, prev):
        # prev: (1, B, T_x) accumulated frame y-1
        v_in = value_ref[pl.ds(y, 1), :, :]
        in_band = (xs >= jnp.maximum(0, t_x + y - t_y)) & (
            xs < jnp.minimum(t_x, y + 1)
        )
        v_cur = jnp.where(xs == y, MAX_NEG_VAL, prev)
        shifted = pltpu.roll(prev, 1, axis=2)  # x-1 -> x (x=0 overwritten)
        v_prev = jnp.where(
            xs == 0, jnp.where(y == 0, 0.0, MAX_NEG_VAL), shifted
        )
        row = jnp.where(in_band, jnp.maximum(v_cur, v_prev) + v_in, v_in)
        dp_ref[pl.ds(y, 1), :, :] = row
        return row

    jax.lax.fori_loop(0, T_y, fwd_body, jnp.zeros((1, B, T_x), jnp.float32))

    # ---- backtrace ---------------------------------------------------
    def bwd_body(i, index):
        # index: (1, B, 1) current token per sample
        y = T_y - 1 - i
        active = y < t_y  # (1, B, 1)
        on_index = xs == index
        path_ref[pl.ds(y, 1), :, :] = jnp.where(active & on_index, 1.0, 0.0)
        prev_row = dp_ref[pl.ds(jnp.maximum(y - 1, 0), 1), :, :]
        prev_up = pltpu.roll(prev_row, 1, axis=2)  # dp[y-1, x-1] at lane x
        dec_row = (xs != 0) & ((xs == y) | ((y > 0) & (prev_row < prev_up)))
        dec = (
            jnp.sum(jnp.where(on_index & dec_row, 1, 0), axis=2, keepdims=True)
            > 0
        )
        return jnp.where(active & dec, index - 1, index)

    init_index = jnp.maximum(t_x - 1, 0)
    jax.lax.fori_loop(0, T_y, bwd_body, init_index)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_pallas(value, t_xs, t_ys, interpret: bool = False):
    """value: (B, T_x, T_y) float32 masked log-prior -> float32 paths
    (B, T_x, T_y)."""
    B, T_x, T_y = value.shape
    value_t = jnp.transpose(value, (2, 0, 1)).astype(jnp.float32)  # (T_y, B, T_x)
    path_t = pl.pallas_call(
        _mas_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_y, B, T_x), jnp.float32)],
        interpret=interpret,
    )(
        value_t,
        t_xs.astype(jnp.int32)[:, None],
        t_ys.astype(jnp.int32)[:, None],
    )
    return jnp.transpose(path_t, (1, 2, 0))
