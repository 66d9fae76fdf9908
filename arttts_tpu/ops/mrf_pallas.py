"""Pallas TPU kernel for HiFi-GAN's multi-receptive-field (MRF) stack.

Why: the MRF stages run 18 dilated 1-D convolutions per stage over waveform-
rate signals at small channel counts (512 -> 32).  XLA materializes every
intermediate in lane-padded layouts (C=32 pads to 128 lanes -> 4x bytes) and
re-tiles around each conv; the profiled stage-4 MRF alone runs ~6.2 ms for
~50 GFLOP (see CLAUDE.md perf notes).  This kernel runs one WHOLE stage —
3 branches x 3 dilation rounds x 2 convs each, with all residual adds and
leaky-relus — per grid step entirely in VMEM:

  * tiles over the time axis with a halo covering the stage's cumulative
    receptive field; neighbor samples arrive via manual async DMA, sequence
    edges are zeroed with a per-frame validity mask (the reference SAME-pads
    every conv — `hifi-gan/models.py:13-101`);
  * lane packing: for C < 128, r = 128 // C consecutive frames share one
    128-lane row, so every VMEM buffer and DMA is exactly lane-aligned and
    nothing is padded.  Conv taps become a sublane roll plus a lane roll
    with a row-carry select; weights expand to block-diagonal
    kron(I_r, w) so each tap is one full-width (128, 128) MXU contraction;
  * all branch weights stay resident in VMEM (8.3 MB at 128 lanes); the
    C=256 first stage exceeds that and stays on the XLA path
    (`mrf_supported`) — its tensors are the smallest, so XLA's layout
    overhead costs least there.

Semantics are identical to `models/hifigan.py:ResBlock` summed over branches
and divided by the branch count (reference `hifi-gan/models.py:184-199`);
parity is pinned by `tests/test_mrf_pallas.py` in interpret mode (all pack
factors) and the full-generator fast path is compared against
`HiFiGANGenerator.apply`.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

LRELU_SLOPE = 0.1
LANES = 128

# ---------------------------------------------------------------------------
# VMEM budget — ONE coordinated model (round-2 postmortem: three uncoupled
# magic numbers shipped a compile-time OOM, BENCH_r02).
#
# The compiler's scoped-VMEM stack for this kernel is empirically
#     usage ≈ weight_bytes + c_row * L        (L = T_b + 2H packed rows)
# Calibration point (the r02 crash): C=64, rw=128, T_b=8192, H=40
# ⇒ L=8272, weights 8.26 MB (the crash dump's operand shapes sum to
# 2*3*21*128*128 f32), reported usage "117.54M" ⇒ c_row ≈ 13.2 kB/row
# ≈ 25.8 live (L, rw)-f32 buffers.  N_LIVE_BUFFERS=28 gives ~9% margin over
# that measured liveness, and VMEM_SLACK_BYTES reserves fixed headroom under
# the limit we pass the compiler.  `_pick_tile` asserts the invariant
#     weight_bytes + N_LIVE*4*rw*(T_b + 2H) <= VMEM_LIMIT - SLACK
# for every tile it returns, and `mrf_supported` uses the same budget to
# bound resident weights — nothing else in this file sizes VMEM.
# Hardware check (r3): auto tile 4096 (predicted 65 MB) compiled and ran,
# 10.38 ms full vocoder.
# ---------------------------------------------------------------------------
VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # passed to the compiler
VMEM_SLACK_BYTES = 12 * 1024 * 1024  # headroom for compiler-managed temps
N_LIVE_BUFFERS = 28  # measured 25.8 live (L, rw) f32 buffers + margin


def mrf_runtime_enabled() -> bool:
    """Serving gate for the Pallas fast paths: real TPU backend only, with
    an env kill switch (`ARTTTS_DISABLE_MRF_PALLAS=1`) so serving/bench can
    always fall back to the XLA vocoder if the kernel fails to compile."""
    import os

    if os.environ.get("ARTTTS_DISABLE_MRF_PALLAS", "0") not in ("", "0"):
        return False
    return jax.default_backend() != "cpu"


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _halo_rf(kernel_sizes: Sequence[int], dilations: Sequence[int]) -> int:
    """Cumulative one-sided receptive field of the deepest branch: each
    dilation round applies conv(k, d) then conv(k, 1)."""
    kmax = max(kernel_sizes)
    return (kmax - 1) // 2 * (sum(dilations) + len(dilations))


def _shift_packed(x, delta: int, r: int, C: int, q_idx):
    """Value at packed (row, q) of the result = x at frame row*r + q + delta.

    delta decomposes as sigma*r + lam (0 <= lam < r): a sublane roll brings
    row+sigma (and row+sigma+1) into place, a lane roll realigns sub-frames,
    and a select applies the row carry where q + lam wraps.  All rolls are
    circular — wrapped values land in the halo and are never written out.
    """
    L = x.shape[0]
    sigma = delta // r  # floor division (handles negative deltas)
    lam = delta - sigma * r
    base = pltpu.roll(x, (-sigma) % L, axis=0)
    if lam == 0:
        return base
    nxt = pltpu.roll(x, (-sigma - 1) % L, axis=0)
    s = (LANES - lam * C) % LANES
    a = pltpu.roll(base, s, axis=1)
    b = pltpu.roll(nxt, s, axis=1)
    return jnp.where(q_idx < r - lam, a, b)


def _conv_packed(x, w_flat, bias, k: int, d: int, r: int, C: int, q_idx,
                 rw: int, bf16: bool = False):
    """SAME dilated conv on a lane-packed haloed tile: k full-width dots.
    `rw` is the packed row width (128 for C <= 128, C itself above).
    With `bf16`, the dot inputs are bfloat16 (weights arrive pre-cast) with
    f32 accumulation — the MXU's native mode, ~2x the f32 3-pass rate.
    The cast happens AFTER the shift: Mosaic has no bf16 dynamic_rotate
    lowering (hardware-compile finding, r3)."""
    pad = (k - 1) // 2 * d
    out = None
    for j in range(k):
        shifted = _shift_packed(x, j * d - pad, r, C, q_idx)
        if bf16:
            shifted = shifted.astype(jnp.bfloat16)
        w = w_flat[j * rw : (j + 1) * rw, :]
        part = jnp.dot(shifted, w, preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out + bias[None, :].astype(jnp.float32)


def _mrf_kernel(
    x_hbm,
    *refs,
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[int, ...],
    r: int,
    C: int,
    T_b: int,
    H: int,
    rows_total: int,
    T_total: int,
    has_film: bool,
    rw: int,
):
    n_br = len(kernel_sizes)
    w_refs = refs[: 4 * n_br]
    pos = 4 * n_br
    if has_film:
        fa_ref, fb_ref = refs[pos], refs[pos + 1]
        pos += 2
    out_ref = refs[pos]
    xs = refs[pos + 1]
    sem = refs[pos + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    L = T_b + 2 * H
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * T_b, L), :], xs, sem)
    dma.start()
    dma.wait()

    x0 = xs[:]
    bf16 = w_refs[0].dtype == jnp.bfloat16
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, rw), 1)
    q_idx = jnp.minimum(lane // C, r - 1)
    # Frames outside the sequence must read as zero into EVERY conv (the
    # reference SAME-pads each layer); mask by global frame index.
    row = jax.lax.broadcasted_iota(jnp.int32, (L, rw), 0)
    frame = (i * T_b + row - H) * r + q_idx
    valid = ((frame >= 0) & (frame < T_total)).astype(x0.dtype)

    acc = None
    for br, k in enumerate(kernel_sizes):
        w1s, b1s, w2s, b2s = w_refs[4 * br : 4 * br + 4]
        xb = x0
        for di, d in enumerate(dilations):
            xt = _lrelu(xb)
            xt = _conv_packed(
                xt, w1s[di], b1s[di], k, d, r, C, q_idx, rw, bf16
            ) * valid
            xt = _lrelu(xt)
            xt = _conv_packed(xt, w2s[di], b2s[di], k, 1, r, C, q_idx, rw, bf16)
            if has_film:
                # speaker FiLM: xt * a + b_ (sparc_block.py:177-204), then
                # the sequence-edge zero like every other conv output
                xt = xt * fa_ref[br, di, b][None, :] + fb_ref[br, di, b][None, :]
            xt = xt * valid
            xb = xb + xt
        acc = xb if acc is None else acc + xb
    out_ref[0] = acc[H : H + T_b, :] * (1.0 / n_br)


def _weight_bytes(kernel_sizes, dilations, C: int, itemsize: int = 4) -> int:
    rw = max(C, LANES)  # kron-packed below 128 lanes, plain above
    return 2 * len(dilations) * sum(kernel_sizes) * rw * rw * itemsize


# C > 128 keeps 33 MB of weights resident (v5e physical VMEM holds it —
# probed to >= 96 MB) and passes interpret-mode parity, but measured on
# hardware it LOSES to XLA (1.88 vs 1.39 ms for the C=256 stage): with no
# lane padding at 256 channels XLA's conv emitters are already near-peak,
# and the small stage-1 tensors cannot amortize the resident weights.
# Off in serving; ARTTTS_MRF_WIDE=1 re-enables for experiments (e.g. with
# the bf16 dot path, which halves the resident weights).
ALLOW_WIDE_CHANNELS = os.environ.get(
    "ARTTTS_MRF_WIDE", "0"
) not in ("", "0")


def mrf_supported(C: int, kernel_sizes=(3, 7, 11), dilations=(1, 3, 5)) -> bool:
    """The kernel keeps all branch weights resident in VMEM (v5e has
    ~128 MB physical VMEM; the 16 MB scoped default is raised via
    compiler_params). C must either divide the lane width (pack factor
    r = 128 // C) or be a multiple of it; the resident weights must leave
    room for at least a minimal (64-row) tile under the VMEM budget."""
    ok_c = (C <= LANES and LANES % C == 0) or (
        ALLOW_WIDE_CHANNELS and C % LANES == 0
    )
    rw = max(C, LANES)
    min_tile_bytes = N_LIVE_BUFFERS * 4 * rw * (64 + 2 * 64)
    return ok_c and (
        _weight_bytes(kernel_sizes, dilations, C) + min_tile_bytes
        <= VMEM_LIMIT_BYTES - VMEM_SLACK_BYTES
    )


def _pick_tile(rows: int, H: int, kernel_sizes, dilations, C: int,
               itemsize: int = 4) -> int:
    """Largest power-of-two packed-row tile dividing `rows` whose estimated
    compiler working set — resident weights + N_LIVE_BUFFERS live
    (T_b + 2H, rw) f32 buffers — fits under the VMEM budget.  The estimate
    is asserted, so a model drift fails loudly at trace time instead of as
    a compile-time OOM (the BENCH_r02 failure mode).

    `ARTTTS_MRF_TILE` overrides the row count for hardware sweeps; the
    override still must pass the budget assertion."""
    import os

    rw = max(C, LANES)
    budget = VMEM_LIMIT_BYTES - VMEM_SLACK_BYTES
    w_bytes = _weight_bytes(kernel_sizes, dilations, C, itemsize)
    avail = budget - w_bytes
    assert avail > 0, "mrf_supported should have rejected this config"
    # live tile buffers are modeled at f32 regardless of the dot dtype
    # (activations stay f32; bf16 copies only shrink the true footprint)
    max_rows = avail // (N_LIVE_BUFFERS * 4 * rw) - 2 * H  # L = T_b + 2H
    tile = 1 << int(np.log2(max(max_rows, 64)))
    tile = min(tile, 1 << int(np.log2(rows)))
    while rows % tile:
        tile //= 2
    env = os.environ.get("ARTTTS_MRF_TILE", "")
    if env:
        t = int(env)
        if rows % t == 0:
            tile = t
    est = w_bytes + N_LIVE_BUFFERS * 4 * rw * (tile + 2 * H)
    assert est <= budget, (
        f"MRF tile {tile} estimated VMEM {est/2**20:.1f} MiB exceeds budget "
        f"{budget/2**20:.1f} MiB (weights {w_bytes/2**20:.1f} MiB, H={H})"
    )
    return tile


def _mrf_stage_impl(
    x: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[int, ...],
    interpret: bool,
    film,
    channels: int = 0,
    packed_out: bool = False,
    bf16: bool = False,
) -> jnp.ndarray:
    # channels != 0 marks lane-packed input (B, rows, 128) holding
    # 128 // channels frames per row (the representation the stage-chained
    # upsample kernel produces); packed_out skips the final unpack.
    if channels:
        C = channels
        B = x.shape[0]
        T = x.shape[1] * max(1, LANES // C)
    else:
        B, T, C = x.shape
    assert mrf_supported(C, kernel_sizes, dilations), (C, kernel_sizes)
    r = max(1, LANES // C)
    rw = max(C, LANES)
    assert T % r == 0, (T, r)
    rows_total = T // r

    def expand_w(w):
        """(n_dil, k*C, C) -> block-diagonal (n_dil, k*128, 128)."""
        n_dil, kc, _ = w.shape
        k = kc // C
        w4 = w.reshape(n_dil, k, C, C)
        eye = jnp.eye(r, dtype=w.dtype)
        big = jnp.einsum("nkab,ij->nkiajb", w4, eye)
        return big.reshape(n_dil, k * LANES, LANES)

    if r > 1:
        weights = tuple(
            expand_w(w) if w.ndim == 3 else jnp.tile(w, (1, r))
            for w in weights
        )
        if film is not None:
            film = tuple(jnp.tile(f, (1, 1, 1, r)) for f in film)
        if not channels:
            x = x.reshape(B, rows_total, LANES)
    if bf16:
        # weight matrices pre-cast so the kernel's dots run in the MXU's
        # native bf16 mode with f32 accumulation; biases/FiLM stay f32
        weights = tuple(
            w.astype(jnp.bfloat16) if w.ndim == 3 else w for w in weights
        )

    H_rf = _halo_rf(kernel_sizes, dilations)
    # packed-row halo: receptive field plus one carry row per conv, aligned
    # to the f32 sublane tile
    n_convs = 2 * len(dilations)
    H = -(-(H_rf // r + n_convs + 4) // 8) * 8
    T_b = _pick_tile(
        rows_total, H, kernel_sizes, dilations, C, itemsize=2 if bf16 else 4
    )
    n_tiles = rows_total // T_b
    x_pad = jnp.pad(x, ((0, 0), (H, H), (0, 0)))

    n_br = len(kernel_sizes)
    n_w = 4 * n_br + (2 if film is not None else 0)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w
    kern = functools.partial(
        _mrf_kernel,
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(dilations),
        r=r,
        C=C,
        T_b=T_b,
        H=H,
        rows_total=rows_total,
        T_total=T,
        has_film=film is not None,
        rw=rw,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
        out_specs=pl.BlockSpec(
            (1, T_b, rw), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows_total, rw), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T_b + 2 * H, rw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x_pad, *(weights + (tuple(film) if film is not None else ())))
    return out if packed_out else out.reshape(B, T, C)


def _mrf_partitioned(kernel_sizes, dilations, interpret, n_w, has_film,
                     channels=0, packed_out=False, bf16=False):
    """GSPMD partitioning: the stage is independent per batch row, so under
    a sharded mesh each device runs the kernel on its local batch shard
    (weights replicated, FiLM vectors batch-sharded on their axis 2) —
    the same policy as the MAS kernel (`mas_pallas.py`)."""

    def run(x, *wf):
        weights = wf[:n_w]
        film = (wf[n_w], wf[n_w + 1]) if has_film else None
        return _mrf_stage_impl(
            x, tuple(weights), kernel_sizes, dilations, interpret, film,
            channels=channels, packed_out=packed_out, bf16=bf16,
        )

    fn = custom_partitioning(run)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        x_sh = NamedSharding(mesh, P(batch, None, None))
        arg_sh = [x_sh]
        for i, a in enumerate(arg_shapes[1:]):
            if has_film and i >= n_w:
                arg_sh.append(NamedSharding(mesh, P(None, None, batch, None)))
            else:
                arg_sh.append(
                    NamedSharding(mesh, P(*([None] * len(a.shape))))
                )
        return mesh, run, x_sh, tuple(arg_sh)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None))

    # sdy rule: batch factor shared by x, film and the result; every other
    # dimension gets its own factor
    names = iter(f"d{i}" for i in range(200))
    operands = [("b", next(names), next(names))]
    for i in range(n_w):
        operands.append(tuple(next(names) for _ in range(2 + (i % 2 == 0))))
    if has_film:
        for _ in range(2):
            operands.append((next(names), next(names), "b", next(names)))
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=SdyShardingRule(
            tuple(operands), (("b", next(names), next(names)),)
        ),
    )
    return fn


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilations", "interpret", "channels", "packed_out",
        "bf16",
    ),
)
def mrf_stage(
    x: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[int, ...] = (1, 3, 5),
    interpret: bool = False,
    film=None,
    channels: int = 0,
    packed_out: bool = False,
    bf16=None,
) -> jnp.ndarray:
    """One full MRF stage: (B, T, C) -> (B, T, C), C <= 128, C | 128.

    `weights` is a flat tuple, 4 arrays per branch (in `kernel_sizes`
    order): w1 (n_dil, k*C, C), b1 (n_dil, C), w2 (n_dil, k*C, C),
    b2 (n_dil, C) — see `pack_mrf_weights`.  `film` is an optional
    (fa, fb) pair of (n_br, n_dil, B, C) per-utterance FiLM vectors
    (the SPARC articulatory vocoder's speaker modulation).  Batch-sharded
    inputs partition per device (`_mrf_partitioned`).
    """
    if bf16 is None:
        # opt-in bf16 dot path (ARTTTS_MRF_BF16=1): ~2x MXU rate and half
        # the resident weight VMEM; default f32 keeps reference bit-band
        # parity. Env is read at trace time — set it before the first call.
        import os

        bf16 = os.environ.get("ARTTTS_MRF_BF16", "0") not in ("", "0")
    n_w = len(weights)
    has_film = film is not None
    fn = _mrf_partitioned(
        tuple(kernel_sizes), tuple(dilations), interpret, n_w, has_film,
        channels=channels, packed_out=packed_out, bf16=bf16,
    )
    args = tuple(weights) + (tuple(film) if has_film else ())
    return fn(x, *args)


def pack_mrf_weights(resblock_params: Sequence[dict], C: int) -> Tuple:
    """Flax `resblock_{i}_{j}` param dicts (conv1_{d}/conv2_{d} with
    (k, Cin, Cout) kernels) -> the flat weight tuple `mrf_stage` expects."""
    flat = []
    for p in resblock_params:
        n_dil = len([k for k in p if k.startswith("conv1_")])
        w1 = jnp.stack(
            [p[f"conv1_{d}"]["kernel"].reshape(-1, C) for d in range(n_dil)]
        )
        b1 = jnp.stack([p[f"conv1_{d}"]["bias"] for d in range(n_dil)])
        w2 = jnp.stack(
            [p[f"conv2_{d}"]["kernel"].reshape(-1, C) for d in range(n_dil)]
        )
        b2 = jnp.stack([p[f"conv2_{d}"]["bias"] for d in range(n_dil)])
        flat += [w1, b1, w2, b2]
    return tuple(flat)
