"""Pallas lane-packed polyphase upsampling for HiFi-GAN's late stages.

The stage-3/4 transposed convs (k = 2*stride) are tiny-FLOP but run ~10x
off the bandwidth roofline under XLA: their outputs have 64/32 channels,
which pad to 128 lanes, and the surrounding leaky-relu / repack fusions
materialize the padded tensors (profiled at ~1.5 ms of the fast vocoder's
11 ms — see CLAUDE.md).  This kernel keeps everything in the 128-lane
*packed* representation the MRF kernel (`ops/mrf_pallas.py`) already uses
— r = 128 // C consecutive frames per row:

  out_row[R] = concat_lanes(lrelu(in[R-1]), lrelu(in[R]), lrelu(in[R+1]))
               @ W_packed (3 * 128, 128)  + bias_packed

For K = 2*stride transposed convs each output frame touches exactly two
input frames, so one packed output row (r_out frames) depends on at most
three packed input rows — one MXU dot (K = 384, N = 128) per row block,
no strides, no padded intermediates.  `W_packed` is not hand-derived: it
is built by probing the *verified* torch-exact `conv_transpose_1d`
(`models/convs.py`) with lane basis vectors, so the tap routing is correct
by construction for any (stride, padding, packing) this layout supports.

Parity: `tests/test_upsample_pallas.py` (interpret mode, both stage
shapes, sequence edges).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

LANES = 128
LRELU_SLOPE = 0.1

# Stage-chained packed serving is ON by default: measured on v5e (r3,
# 768 mel frames, after the roll-based tap rework) full vocoder 9.16 ms
# chained vs 10.38 ms unchained vs 16.15 ms XLA, parity 4.5e-4.
# ARTTTS_PACKED_CHAIN=0 disables for experiments.
ENABLE_PACKED_CHAIN = os.environ.get("ARTTTS_PACKED_CHAIN", "1") not in ("", "0")


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


@functools.partial(jax.jit, static_argnames=("stride", "padding", "r_in", "r_out"))
def build_packed_ups_matrix(
    w: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    padding: int,
    r_in: int,
    r_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Cin, Cout, K) torch-layout ConvT weight -> (3*128, 128) packed map.

    Probes `conv_transpose_1d` with one basis signal per packed input lane
    of the three contributing rows; the interior output row R=1 of the
    probe gives that lane's contribution to the packed output row.
    """
    from arttts_tpu.models.convs import conv_transpose_1d

    cin, cout, k = w.shape
    assert k == 2 * stride, (k, stride)
    assert r_in * cin == LANES and r_out * cout == LANES, (r_in, cin, r_out, cout)

    # basis batch: 3 rows * r_in frames * cin channels unit impulses over a
    # 3-row (9-frame-margin) window; frames [r_in*s .. 2*r_in*s) of the
    # output correspond to packed output row R=1
    n_basis = 3 * LANES
    frames_in = 3 * r_in
    x = jnp.zeros((n_basis, frames_in, cin), jnp.float32)
    idx = jnp.arange(n_basis)
    frame = (idx // cin) % (3 * r_in)
    chan = idx % cin
    x = x.at[idx, frame, chan].set(1.0)
    y = conv_transpose_1d(x, w, stride, padding)  # (n_basis, T_out, cout)
    # output frames belonging to packed row R=1 of the middle input row:
    # global frame f = r_out * 1 + q  maps to y frame  f + padding  minus
    # the left overhang the probe's row-0 margin adds: the probe's frame 0
    # is input frame -r_in relative to the middle row, so output frame 0 of
    # the middle row sits at probe frame r_in * stride - padding + padding
    start = r_in * stride
    rows = y[:, start : start + r_out, :]  # (n_basis, r_out, cout)
    w_packed = rows.reshape(n_basis, r_out * cout)
    b_packed = jnp.tile(bias, (r_out,))  # conv_transpose_1d is bias-free
    return w_packed, b_packed


HALO = 8  # sublane-tile-aligned halo (only rows +-1 are actually consumed)


def _ups_kernel(x_hbm, w_ref, b_ref, out_ref, xs, sem, *, T_b, rows_total):
    b = pl.program_id(0)
    i = pl.program_id(1)
    L = T_b + 2 * HALO
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * T_b, L), :], xs, sem)
    dma.start()
    dma.wait()

    a = _lrelu(xs[:])
    # zero rows outside the sequence (the padded halo is already zero; this
    # guards the roll-in at global edges)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    g = i * T_b + row - HALO
    a = a * ((g >= 0) & (g < rows_total)).astype(a.dtype)
    # output row t consumes input rows (t-1, t, t+1) = xs rows
    # (t+HALO-1, t+HALO, t+HALO+1). Bring each tap to offset 0 with a
    # sublane roll and contract against its (128, 128) block of the packed
    # map — Mosaic cannot lane-concatenate sublane-offset slices (the
    # r02-era concat formulation failed hardware compile), and three K=128
    # dots need no concatenated operand at all.
    out = None
    for j in range(3):
        tap = pltpu.roll(a, (-(HALO - 1 + j)) % L, axis=0)[:T_b]
        w = w_ref[j * LANES : (j + 1) * LANES, :]
        part = jnp.dot(tap, w, preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    out_ref[0] = out + b_ref[:][None, :]


@functools.partial(
    jax.jit, static_argnames=("stride", "padding", "r_in", "r_out", "interpret")
)
def upsample_packed(
    x_packed: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    padding: int,
    r_in: int,
    r_out: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """leaky_relu + ConvTranspose1d(k=2*stride) on lane-packed rows.

    x_packed: (B, rows, 128) holding r_in frames per row of Cin channels;
    returns (B, rows, 128) holding r_out frames per row of Cout channels
    (the frame count scales by `stride`; rows stay constant because
    r_out = r_in * stride * Cout / Cin ... == stride * r_in * Cout/Cin).
    """
    B, rows, lanes = x_packed.shape
    assert lanes == LANES
    w_packed, b_packed = build_packed_ups_matrix(
        w, bias, stride, padding, r_in, r_out
    )
    fn = _ups_partitioned(interpret)
    return fn(x_packed, w_packed, b_packed)


def _ups_impl(x_packed, w_packed, b_packed, interpret: bool):
    B, rows, _ = x_packed.shape
    T_b = 2048
    while rows % T_b:
        T_b //= 2
    x_pad = jnp.pad(x_packed, ((0, 0), (HALO, HALO), (0, 0)))
    kern = functools.partial(_ups_kernel, T_b=T_b, rows_total=rows)
    return pl.pallas_call(
        kern,
        grid=(B, rows // T_b),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T_b, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), x_packed.dtype),
        scratch_shapes=[
            pltpu.VMEM((T_b + 2 * HALO, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, w_packed, b_packed)


@functools.lru_cache(maxsize=None)
def _ups_partitioned(interpret: bool):
    """GSPMD rule: independent per batch row — each device runs the kernel
    on its local batch shard, weights replicated (same policy as
    `mrf_pallas._mrf_partitioned`)."""

    def run(x, w, b):
        return _ups_impl(x, w, b, interpret)

    fn = custom_partitioning(run)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        x_sh = NamedSharding(mesh, P(batch, None, None))
        rep2 = NamedSharding(mesh, P(None, None))
        rep1 = NamedSharding(mesh, P(None))
        return mesh, run, x_sh, (x_sh, rep2, rep1)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=SdyShardingRule(
            (("b", "r", "l"), ("wk", "wn"), ("bl",)), (("b", "r", "l"),)
        ),
    )
    return fn
