"""Pallas kernels for the U-Net's resolution changes on kernel layouts.

The fused-resblock serving path (`models/unet2d_fast.py`) keeps the
whole U-Net body in Pallas layouts; the two stride-2 boundary convs at
full resolution were the last XLA convolutions there, and XLA lowers
them catastrophically when sandwiched between custom-call outputs (323
us for the 4x4 ConvTranspose at (80, 768) — r3 trace, CLAUDE.md).

* `downsample2d_to_real64`: flax `Downsample2d` (3x3, stride 2, pad 1;
  `models/unet2d.py:179-188`, ref `model/diffusion.py:30-36`) from the
  h-parity packed full-res layout to the real64 half-res layout.  The
  time stride is handled by even/odd pre-split columns (two cheap XLA
  strided slices); the h stride folds into the packed parity structure
  (output row r reads pair r's both parities and pair r-1's parity 1),
  giving 6 full-width dots.

* `conv_transpose2d_from_real64`: `ConvTranspose2dTorch` (4x4, stride
  2, pad 1; `models/convs.py:133`, ref `model/diffusion.py:21-27`) from
  real64 half-res to packed full-res.  Output h parity is exactly the
  packed lane parity (no h interleave needed); output time phases are
  emitted as separate even/odd planes and interlaced by one XLA
  reshape.  Cross-parity taps ride a composite operand (lane-rolled
  up-shift + down-shift), 4 dots per plane.

Parity: tests/test_updown_pallas.py (interpret, f32) against the flax
modules.  Dots multiply in bf16 with f32 accumulation (XLA's conv mode
on v5e) unless `bf16=False`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arttts_tpu.ops.resblock2d_pallas import (
    LANES,
    PAD,
    VMEM_LIMIT_BYTES,
    _emit,
)

C_HALF = 64


# ---------------------------------------------------------------------------
# Downsample: packed (B, P, T+2*PAD, 128) -> real64 (B, P, T/2+2*PAD, 128)
# ---------------------------------------------------------------------------


def pack_downsample_params(p: dict) -> Tuple[jnp.ndarray, ...]:
    """Flax `Downsample2d` params (Conv_0: HWIO (3,3,64,64) + bias)."""
    w = p["Conv_0"]["kernel"].astype(jnp.float32)
    z = jnp.zeros((C_HALF, C_HALF), jnp.float32)
    wa = []  # same-pair: rows par0 <- w[kh=1], par1 <- w[kh=2]
    wb = []  # pair r-1: rows par1 <- w[kh=0]
    for kt in range(3):
        wa.append(
            jnp.concatenate(
                [
                    jnp.concatenate([w[1, kt], z], axis=1),
                    jnp.concatenate([w[2, kt], z], axis=1),
                ],
                axis=0,
            )
        )
        wb.append(
            jnp.concatenate(
                [
                    jnp.concatenate([z, z], axis=1),
                    jnp.concatenate([w[0, kt], z], axis=1),
                ],
                axis=0,
            )
        )
    bias = jnp.pad(p["Conv_0"]["bias"].astype(jnp.float32), (0, C_HALF))
    return (jnp.stack(wa), jnp.stack(wb), bias[None])


def _down_kernel(
    lens_ref, xe_hbm, xo_hbm, wa, wb, bias, out_hbm, xe_s, xo_s, out_scr,
    sem_e, sem_o, sem_out, *, T2: int, T_b: int, n_tiles: int, P: int,
    bf16: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * T_b
    L = T_b + 2 * PAD
    length = lens_ref[b]

    ce = pltpu.make_async_copy(xe_hbm.at[b, :, pl.ds(t0, L), :], xe_s, sem_e)
    co = pltpu.make_async_copy(xo_hbm.at[b, :, pl.ds(t0, L), :], xo_s, sem_o)
    ce.start(); co.start(); ce.wait(); co.wait()

    # column c of this tile holds output frame j = t0 + c - PAD, fed by
    # input frames 2j (xe) and 2j +/- 1 (xo)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, L, LANES), 1) + (t0 - PAD)
    ve = ((j >= 0) & (2 * j < length)).astype(jnp.float32)
    vo = ((j >= 0) & (2 * j + 1 < length)).astype(jnp.float32)
    xem = xe_s[:] * ve
    xom = xo_s[:] * vo

    dt_ = jnp.bfloat16 if bf16 else jnp.float32
    zrow = jnp.zeros((1, L, LANES), jnp.float32)

    def dn(x):  # pair r-1 into row r
        return jnp.concatenate([zrow, x[:-1]], axis=0)

    srcs = (pltpu.roll(xom, 1, axis=1), xem, xom)  # kt = 0, 1, 2
    acc = None
    for kt in range(3):
        s = srcs[kt]
        pa = jax.lax.dot_general(
            s.astype(dt_), wa[kt].astype(dt_), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pb = jax.lax.dot_general(
            dn(s).astype(dt_), wb[kt].astype(dt_), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        part = pa + pb
        acc = part if acc is None else acc + part
    # bias everywhere (the module adds it unmasked; consumers mask)
    y = acc + bias[:][None]
    _emit(
        y[:, PAD : T_b + PAD, :], out_scr, out_hbm, sem_out,
        b, i, t0, T_b, n_tiles, P, LANES,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def downsample2d_to_real64(
    x_packed: jnp.ndarray,
    lengths: jnp.ndarray,
    params: Tuple[jnp.ndarray, ...],
    interpret: bool = False,
    bf16: bool = True,
) -> jnp.ndarray:
    """(B, P, T+2*PAD, 128) packed -> (B, P, T/2+2*PAD, 128) real64."""
    B, P, Tp, _ = x_packed.shape
    T = Tp - 2 * PAD
    T2 = T // 2
    interior = x_packed[:, :, PAD : PAD + T, :]
    xe = jnp.pad(interior[:, :, 0::2, :], ((0, 0), (0, 0), (PAD, PAD), (0, 0)))
    xo = jnp.pad(interior[:, :, 1::2, :], ((0, 0), (0, 0), (PAD, PAD), (0, 0)))

    T_b = T2 if T2 <= 512 else 256
    while T2 % T_b:
        T_b //= 2
    n_tiles = T2 // T_b
    L = T_b + 2 * PAD
    kern = functools.partial(
        _down_kernel, T2=T2, T_b=T_b, n_tiles=n_tiles, P=P, bf16=bf16
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[any_spec, any_spec, vec, vec, vec],
            out_specs=any_spec,
            scratch_shapes=[
                pltpu.VMEM((P, L, LANES), jnp.float32),
                pltpu.VMEM((P, L, LANES), jnp.float32),
                pltpu.VMEM((P, L, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, P, T2 + 2 * PAD, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(lengths.astype(jnp.int32), xe, xo, *params)


# ---------------------------------------------------------------------------
# ConvTranspose: real64 (B, P, T2+2*PAD, 128) -> packed (B, P, T+2*PAD, 128)
# ---------------------------------------------------------------------------


def pack_convt_params(p: dict) -> Tuple[jnp.ndarray, ...]:
    """`ConvTranspose2dTorch` params: torch-layout weight (64, 64, 4, 4)
    + bias (64,).  Builds per-(plane, t-tap) mid and cross matrices."""
    w = p["weight"].astype(jnp.float32)  # (in, out, kh, kt)
    z = jnp.zeros((C_HALF, C_HALF), jnp.float32)
    # kt per (plane s, dt index): E: dt0 -> kt1, dt-1 -> kt3; O: dt+1 ->
    # kt0, dt0 -> kt2
    kts = ((1, 3), (2, 0))  # [s][0]=same-frame tap, [s][1]=shifted tap
    wmid, wcross = [], []
    for s in range(2):
        for idx in range(2):
            kt = kts[s][idx]
            # mid (dh=0): rows real -> cols o0 via kh=1, o1 via kh=2
            wmid.append(
                jnp.concatenate(
                    [
                        jnp.concatenate(
                            [w[:, :, 1, kt], w[:, :, 2, kt]], axis=1
                        ),
                        jnp.concatenate([z, z], axis=1),
                    ],
                    axis=0,
                )
            )
            # cross composite: lanes [0:64) hold pair r-1 (feeds o0 via
            # kh=3), lanes [64:128) hold pair r+1 (feeds o1 via kh=0)
            wcross.append(
                jnp.concatenate(
                    [
                        jnp.concatenate([w[:, :, 3, kt], z], axis=1),
                        jnp.concatenate([z, w[:, :, 0, kt]], axis=1),
                    ],
                    axis=0,
                )
            )
    bias = jnp.concatenate([p["bias"], p["bias"]]).astype(jnp.float32)
    return (jnp.stack(wmid), jnp.stack(wcross), bias[None])


def _convt_kernel(
    lens_ref, x_hbm, wmid, wcross, bias, e_hbm, o_hbm, xs, e_scr, o_scr,
    sem_in, sem_e, sem_o, *, T2: int, T_b: int, n_tiles: int, P: int,
    bf16: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * T_b
    L = T_b + 2 * PAD
    length = lens_ref[b]

    cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(t0, L), :], xs, sem_in)
    cp.start(); cp.wait()

    # input column c holds input frame j = t0 + c - PAD (half rate)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, L, LANES), 1) + (t0 - PAD)
    # input valid frames: the caller already masked x by its own mask;
    # mask borders/halo so neighbour taps read zero
    vin = ((j >= 0) & (2 * j < length)).astype(jnp.float32)
    xm = xs[:] * vin

    dt_ = jnp.bfloat16 if bf16 else jnp.float32
    zrow = jnp.zeros((1, L, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, L, LANES), 2)

    def comp_of(x):
        x_dn = jnp.concatenate([zrow, x[:-1]], axis=0)   # pair r-1
        x_up = jnp.concatenate([x[1:], zrow], axis=0)    # pair r+1
        return jnp.where(lane < C_HALF, x_dn, pltpu.roll(x_up, C_HALF, axis=2))

    for s, scr, hbm, sem in ((0, e_scr, e_hbm, sem_e), (1, o_scr, o_hbm, sem_o)):
        # same-frame operand and the shifted-frame operand for this plane
        if s == 0:
            shifted = pltpu.roll(xm, 1, axis=1)    # in[j-1]
        else:
            shifted = pltpu.roll(xm, (-1) % L, axis=1)  # in[j+1]
        acc = None
        for idx, op in ((0, xm), (1, shifted)):
            w_i = 2 * s + idx
            pa = jax.lax.dot_general(
                op.astype(dt_), wmid[w_i].astype(dt_),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pb = jax.lax.dot_general(
                comp_of(op).astype(dt_), wcross[w_i].astype(dt_),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            part = pa + pb
            acc = part if acc is None else acc + part
        y = acc + bias[:][None]
        _emit(
            y[:, PAD : T_b + PAD, :], scr, hbm, sem,
            b, i, t0, T_b, n_tiles, P, LANES,
        )


# ---------------------------------------------------------------------------
# Wide mid-level boundaries (r5, VERDICT r4 #4): the two remaining XLA ops
# inside the fast U-Net body — Downsample2d_1 (3x3 stride-2, C=128) and
# ConvTranspose2dTorch_0 (4x4 stride-2, C=128) — plus their pad/unpad
# neighbours.  The r4 paired traces showed exactly these boundaries blowing
# up at B=8: XLA *unfuses* the pad/slice/copy ops around the custom calls
# (copy/layout 0.172 -> 3.46 ms/step, x20).  Channels ride full lanes
# (C=128), rows stay a plain leading dim, so both strides become row-parity
# pre-splits (host strided slices) + shifted full-width dots.
# ---------------------------------------------------------------------------


def pack_downsample_wide_params(p: dict) -> Tuple[jnp.ndarray, ...]:
    """Flax `Downsample2d` params at C=128 (Conv_0: HWIO (3,3,128,128))."""
    w = p["Conv_0"]["kernel"].astype(jnp.float32)  # (3, 3, C, C)
    return (w, p["Conv_0"]["bias"].astype(jnp.float32)[None])


def _down_wide_kernel(
    lens_ref, xee_hbm, xeo_hbm, xoe_hbm, xoo_hbm, w, bias, out_hbm,
    xee_s, xeo_s, xoe_s, xoo_s, out_scr, sem_ee, sem_eo, sem_oe, sem_oo,
    sem_out, *, T4: int, T_b: int, n_tiles: int, H2: int, C: int, bf16: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * T_b
    L = T_b + 2 * PAD
    len2 = lens_ref[b]  # valid frames at the INPUT (T2) resolution

    for hbm, scr, sem in (
        (xee_hbm, xee_s, sem_ee),
        (xeo_hbm, xeo_s, sem_eo),
        (xoe_hbm, xoe_s, sem_oe),
        (xoo_hbm, xoo_s, sem_oo),
    ):
        cp = pltpu.make_async_copy(hbm.at[b, :, pl.ds(t0, L), :], scr, sem)
        cp.start()
        cp.wait()

    # column c holds output frame j = t0 + c - PAD; *e operands carry input
    # frame 2j (valid iff 2j < len2), *o operands carry 2j+1
    j = jax.lax.broadcasted_iota(jnp.int32, (1, L, C), 1) + (t0 - PAD)
    ve = ((j >= 0) & (2 * j < len2)).astype(jnp.float32)
    vo = ((j >= 0) & (2 * j + 1 < len2)).astype(jnp.float32)
    xee = xee_s[:] * ve
    xeo = xeo_s[:] * vo
    xoe = xoe_s[:] * ve
    xoo = xoo_s[:] * vo

    dt_ = jnp.bfloat16 if bf16 else jnp.float32
    zrow = jnp.zeros((1, L, C), jnp.float32)

    def dn(x):  # input row 2r-1 = odd-row operand shifted down one
        return jnp.concatenate([zrow, x[:-1]], axis=0)

    # time taps: kt=0 -> in[2j-1] (roll of *o), kt=1 -> in[2j], kt=2 -> in[2j+1]
    te = (pltpu.roll(xeo, 1, axis=1), xee, xeo)
    to = (pltpu.roll(xoo, 1, axis=1), xoe, xoo)
    acc = None
    for kt in range(3):
        # row taps: kh=0 -> row 2r-1 (dn of odd), kh=1 -> 2r (even), kh=2 -> 2r+1
        for kh, op in ((0, dn(to[kt])), (1, te[kt]), (2, to[kt])):
            part = jax.lax.dot_general(
                op.astype(dt_), w[kh, kt].astype(dt_),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    y = acc + bias[:][None]  # bias everywhere; consumers mask
    _emit(
        y[:, PAD : T_b + PAD, :], out_scr, out_hbm, sem_out,
        b, i, t0, T_b, n_tiles, H2, C,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def downsample2d_wide(
    x: jnp.ndarray,
    lengths2: jnp.ndarray,
    params: Tuple[jnp.ndarray, ...],
    interpret: bool = False,
    bf16: bool = True,
) -> jnp.ndarray:
    """(B, H, T2+2*PAD, C) padded wide -> (B, H/2, T2/2+2*PAD, C).

    `lengths2` are valid-frame counts at the INPUT resolution (the caller's
    mask at this level); masking is internal, so the caller passes its
    padded wide buffer directly — no unpad/mask/re-pad boundary copies."""
    B, H, T2p, C = x.shape
    T2 = T2p - 2 * PAD
    T4 = T2 // 2
    H2 = H // 2
    interior = x[:, :, PAD : PAD + T2, :]
    # (h parity, t parity) pre-splits: strided slices, no layout change
    ops = []
    for hp in (0, 1):
        for tp in (0, 1):
            ops.append(
                jnp.pad(
                    interior[:, hp::2, tp::2, :],
                    ((0, 0), (0, 0), (PAD, PAD), (0, 0)),
                )
            )

    T_b = T4 if T4 <= 512 else 256
    while T4 % T_b:
        T_b //= 2
    n_tiles = T4 // T_b
    L = T_b + 2 * PAD
    kern = functools.partial(
        _down_wide_kernel, T4=T4, T_b=T_b, n_tiles=n_tiles, H2=H2, C=C,
        bf16=bf16,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[any_spec] * 4 + [vec, vec],
            out_specs=any_spec,
            scratch_shapes=[
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H2, T4 + 2 * PAD, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(lengths2.astype(jnp.int32), *ops, *params)


def pack_convt_wide_params(p: dict) -> Tuple[jnp.ndarray, ...]:
    """`ConvTranspose2dTorch` params at C=128: torch-layout weight
    (in, out, 4, 4) + bias, re-laid as per-(kh, kt) (in, out) matrices."""
    w = p["weight"].astype(jnp.float32)  # (in, out, kh, kt)
    return (
        jnp.transpose(w, (2, 3, 0, 1)),  # (4, 4, in, out)
        p["bias"].astype(jnp.float32)[None],
    )


def _convt_wide_kernel(
    lens_ref, x_hbm, w, bias, ee_hbm, eo_hbm, oe_hbm, oo_hbm, xs,
    ee_scr, eo_scr, oe_scr, oo_scr, sem_in, sem_ee, sem_eo, sem_oe, sem_oo,
    *, T4: int, T_b: int, n_tiles: int, H2: int, C: int, bf16: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * T_b
    L = T_b + 2 * PAD
    len4 = lens_ref[b]  # valid frames at the INPUT (T4) resolution

    cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(t0, L), :], xs, sem_in)
    cp.start()
    cp.wait()

    j = jax.lax.broadcasted_iota(jnp.int32, (1, L, C), 1) + (t0 - PAD)
    vin = ((j >= 0) & (j < len4)).astype(jnp.float32)
    xm = xs[:] * vin

    dt_ = jnp.bfloat16 if bf16 else jnp.float32
    zrow = jnp.zeros((1, L, C), jnp.float32)

    def dn(x):  # input row r-1 (feeds output row 2r via kh=3)
        return jnp.concatenate([zrow, x[:-1]], axis=0)

    def up(x):  # input row r+1 (feeds output row 2r+1 via kh=0)
        return jnp.concatenate([x[1:], zrow], axis=0)

    # output (2r+ph, 2c+pt) <- x[(2r+ph+1-kh)/2, (2c+pt+1-kt)/2]:
    #   ph=0: (kh=1, row r), (kh=3, row r-1); ph=1: (kh=2, row r), (kh=0, r+1)
    #   pt=0: (kt=1, col c), (kt=3, col c-1); pt=1: (kt=2, col c), (kt=0, c+1)
    x_tm1 = pltpu.roll(xm, 1, axis=1)
    x_tp1 = pltpu.roll(xm, (-1) % L, axis=1)
    t_taps = (((1, xm), (3, x_tm1)), ((2, xm), (0, x_tp1)))  # [pt]
    planes = (
        (0, 0, ee_scr, ee_hbm, sem_ee),
        (0, 1, eo_scr, eo_hbm, sem_eo),
        (1, 0, oe_scr, oe_hbm, sem_oe),
        (1, 1, oo_scr, oo_hbm, sem_oo),
    )
    for ph, pt, scr, hbm, sem in planes:
        h_taps = ((1, lambda a: a), (3, dn)) if ph == 0 else (
            (2, lambda a: a), (0, up)
        )
        acc = None
        for kt, top in t_taps[pt]:
            for kh, hop in h_taps:
                part = jax.lax.dot_general(
                    hop(top).astype(dt_), w[kh, kt].astype(dt_),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        y = acc + bias[:][None]
        _emit(
            y[:, PAD : T_b + PAD, :], scr, hbm, sem,
            b, i, t0, T_b, n_tiles, H2, C,
        )


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def conv_transpose2d_wide(
    x: jnp.ndarray,
    lengths4: jnp.ndarray,
    params: Tuple[jnp.ndarray, ...],
    interpret: bool = False,
    bf16: bool = True,
) -> jnp.ndarray:
    """(B, H2, T4+2*PAD, C) padded wide -> (B, 2*H2, 2*T4+2*PAD, C).

    4x4 stride-2 pad-1 ConvTranspose (`ConvTranspose2dTorch`); `lengths4`
    are valid-frame counts at the INPUT resolution. Emits the four
    (h-parity, t-parity) output planes and interleaves them host-side
    (one fused stack/reshape — replaces the unpad/mask/XLA-convT/pad
    chain whose layout copies unfuse at B=8)."""
    B, H2, T4p, C = x.shape
    T4 = T4p - 2 * PAD
    T2 = 2 * T4
    H = 2 * H2

    T_b = T4 if T4 <= 512 else 256
    while T4 % T_b:
        T_b //= 2
    n_tiles = T4 // T_b
    L = T_b + 2 * PAD
    kern = functools.partial(
        _convt_wide_kernel, T4=T4, T_b=T_b, n_tiles=n_tiles, H2=H2, C=C,
        bf16=bf16,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((B, H2, T4 + 2 * PAD, C), jnp.float32)
    ee, eo, oe, oo = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[any_spec, vec, vec],
            out_specs=(any_spec,) * 4,
            scratch_shapes=[
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.VMEM((H2, L, C), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(plane,) * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(lengths4.astype(jnp.int32), x, *params)
    # interleave rows then time: out[b, 2r+ph, 2c+pt] = plane[ph][pt][b, r, c]
    pe = jnp.stack([ee[:, :, PAD:-PAD], eo[:, :, PAD:-PAD]], axis=3)
    po = jnp.stack([oe[:, :, PAD:-PAD], oo[:, :, PAD:-PAD]], axis=3)
    full = jnp.stack([pe, po], axis=2).reshape(B, H, T2, C)
    return jnp.pad(full, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def conv_transpose2d_from_real64(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    params: Tuple[jnp.ndarray, ...],
    interpret: bool = False,
    bf16: bool = True,
) -> jnp.ndarray:
    """(B, P, T2+2*PAD, 128) real64 (pre-masked by the caller's mask) ->
    (B, P, T+2*PAD, 128) packed full-res, T = 2*T2.  `lengths` are FULL-
    resolution valid-frame counts."""
    B, P, T2p, _ = x.shape
    T2 = T2p - 2 * PAD
    T = 2 * T2

    T_b = T2 if T2 <= 512 else 256
    while T2 % T_b:
        T_b //= 2
    n_tiles = T2 // T_b
    L = T_b + 2 * PAD
    kern = functools.partial(
        _convt_kernel, T2=T2, T_b=T_b, n_tiles=n_tiles, P=P, bf16=bf16
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    plane_shape = jax.ShapeDtypeStruct((B, P, T2 + 2 * PAD, LANES), jnp.float32)
    e, o = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[any_spec, vec, vec, vec],
            out_specs=(any_spec, any_spec),
            scratch_shapes=[
                pltpu.VMEM((P, L, LANES), jnp.float32),
                pltpu.VMEM((P, L, LANES), jnp.float32),
                pltpu.VMEM((P, L, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(plane_shape, plane_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, *params)
    # interlace the two time phases and re-pad the packed buffer
    ei = e[:, :, PAD:-PAD, :]
    oi = o[:, :, PAD:-PAD, :]
    full = jnp.stack([ei, oi], axis=3).reshape(B, P, T, LANES)
    return jnp.pad(full, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))
