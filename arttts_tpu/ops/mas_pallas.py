"""Pallas TPU kernel for Monotonic Alignment Search.

Batch-vectorized single-program design: the log-prior is laid out
`(T_y, B, T_x)` so each DP step updates one `(B, T_x)` tile — batch on
sublanes, text positions on lanes — in a single VPU op chain. The column
recurrence for frame y reads only frame y-1 (`core.pyx:17-30`), so the whole
batch advances together through one loop of length T_y.

Two kernel-level optimizations over the naive formulation:
  * the backtrace *decision rows* (`step-diagonal?` bits) are precomputed in
    registers during the forward pass — the backtrace loop never touches the
    DP table again, it just gathers its own bit with a masked lane-reduction
    and updates a per-sample index vector;
  * both loops are manually unrolled 4x to amortize Mosaic loop overhead
    (the per-step tile work is tiny).

This removes the reference's GPU->CPU round trip
(`monotonic_align/__init__.py:8-23`). Exactness vs the NumPy/C++ oracles:
tests/test_mas_native.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from arttts_tpu.ops.mas import MAX_NEG_VAL

_UNROLL = 4


def _mas_kernel(value_ref, t_xs_ref, t_ys_ref, path_ref, dec_ref):
    T_y, B, T_x = dec_ref.shape

    xs = jax.lax.broadcasted_iota(jnp.int32, (1, B, T_x), 2)
    t_x = t_xs_ref[:, :][None, :, :]  # (1, B, 1)
    t_y = t_ys_ref[:, :][None, :, :]

    # ---- forward max-accumulation + decision-bit emission --------------
    def fwd_one(y, prev):
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
        # backtrace decision for frame y (core.pyx:34): from (x, y) step to
        # (x-1, y-1) iff x != 0 and (x == y or dp[x, y-1] < dp[x-1, y-1]).
        dec = (xs != 0) & ((xs == y) | ((y > 0) & (prev < shifted)))
        dec_ref[pl.ds(y, 1), :, :] = jnp.where(dec, 1.0, 0.0)
        return row

    def fwd_body(i, prev):
        y = i * _UNROLL
        for k in range(_UNROLL):
            prev = fwd_one(y + k, prev)
        return prev

    jax.lax.fori_loop(
        0, T_y // _UNROLL, fwd_body, jnp.zeros((1, B, T_x), jnp.float32)
    )

    # ---- backtrace -----------------------------------------------------
    def bwd_one(y, index):
        # index: (1, B, 1) current token per sample
        active = y < t_y  # (1, B, 1)
        on_index = xs == index
        path_ref[pl.ds(y, 1), :, :] = jnp.where(active & on_index, 1.0, 0.0)
        dec_row = dec_ref[pl.ds(y, 1), :, :]
        dec = (
            jnp.sum(jnp.where(on_index, dec_row, 0.0), axis=2, keepdims=True)
            > 0.0
        )
        return jnp.where(active & dec, index - 1, index)

    def bwd_body(i, index):
        y = T_y - 1 - i * _UNROLL
        for k in range(_UNROLL):
            index = bwd_one(y - k, index)
        return index

    init_index = jnp.maximum(t_x - 1, 0)
    jax.lax.fori_loop(0, T_y // _UNROLL, bwd_body, init_index)


def _mas_pallas_impl(value, t_xs, t_ys, interpret: bool = False):
    """value: (B, T_x, T_y) float32 masked log-prior -> float32 paths
    (B, T_x, T_y)."""
    B, T_x, T_y = value.shape
    pad_y = (-T_y) % _UNROLL
    value_t = jnp.transpose(value, (2, 0, 1)).astype(jnp.float32)  # (T_y,B,T_x)
    if pad_y:
        value_t = jnp.pad(value_t, ((0, pad_y), (0, 0), (0, 0)))
    T_y_p = T_y + pad_y
    path_t = pl.pallas_call(
        _mas_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y_p, B, T_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_y_p, B, T_x), jnp.float32)],
        # The kernel keeps input + decision scratch + output (3 whole
        # (T_y, B, T_x) f32 buffers) resident; the default 16 MiB scoped
        # limit caps that at B*T_x*T_y ~ 1.4M elements and the v1 recipe
        # at B=32 (768x32x192 = 4.7M) failed compile (r5 sweep). v5e
        # physical VMEM was probed >= 96 MiB (CLAUDE.md, MRF C=256 note);
        # size the limit to the actual need, capped under that.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(4 * T_y_p * B * T_x * 4 + (8 << 20), 16 << 20),
                100 << 20,
            )
        ),
        interpret=interpret,
    )(
        value_t,
        t_xs.astype(jnp.int32)[:, None],
        t_ys.astype(jnp.int32)[:, None],
    )
    return jnp.transpose(path_t[:T_y], (1, 2, 0))


@functools.lru_cache(maxsize=2)
def _mas_pallas_partitioned(interpret: bool):
    """GSPMD partitioning rule for the kernel: MAS is independent per batch
    row, so under a sharded mesh each device runs the kernel on its local
    batch shard (T_x/T_y forced replicated). Without this rule `pallas_call`
    inside a jitted SPMD train step would fail to partition or silently
    all-gather (the round-1 verdict's multi-chip risk)."""

    @custom_partitioning
    def fn(value, t_xs, t_ys):
        return _mas_pallas_impl(value, t_xs, t_ys, interpret)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        v_sh = NamedSharding(mesh, P(batch, None, None))
        l_sh = NamedSharding(mesh, P(batch))

        def lower_fn(value, t_xs, t_ys):
            return _mas_pallas_impl(value, t_xs, t_ys, interpret)

        return mesh, lower_fn, v_sh, (v_sh, l_sh, l_sh)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=SdyShardingRule(
            (("b", "x", "y"), ("b",), ("b",)), (("b", "x", "y"),)
        ),
    )
    return fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_pallas(value, t_xs, t_ys, interpret: bool = False):
    """Partition-aware MAS kernel entry point (batch-sharding rule above)."""
    return _mas_pallas_partitioned(interpret)(
        value, t_xs.astype(jnp.int32), t_ys.astype(jnp.int32)
    )
