"""Fast serving path for the 2D U-Net score network.

Replaces `GradLogPEstimator2d.__call__` (models/unet2d.py:213-281,
reference `model/diffusion.py:140-252`) for inference on TPU.  The
r3 trace breakdown (CLAUDE.md) shows the C=64 levels cost 53% of every
reverse-diffusion step under XLA — half-lane convs plus ~0.76 ms/step of
layout copies — so exactly those levels run as fused Pallas kernels
(`ops/resblock2d_pallas.py`) on the h-parity packed layout, with the
rezero linear attention computed directly on packed buffers (block-diag
kron(I_2, W) projections — no spatial reshapes).  The C=128/256 middle
of the U-Net stays on XLA, whose conv emitters are near-peak at full
lane width (same finding as the MRF kernel's C=256 gate).

Semantics: identical to the module with masked GroupNorm statistics.
With `masked_norm=False` configs the fast path still computes masked
statistics — equal when batches are unpadded (the B=1 serving protocol;
the reference can only run unpadded batches for exactly this reason,
`arttts_inference.py:227-231`).

Parity: tests/test_unet2d_fast.py (CPU interpret).  Gating:
`unet2d_fast_supported` (static) + `unet2d_fast_runtime_enabled`
(backend + ARTTTS_DISABLE_UNET_PALLAS kill switch).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from arttts_tpu.models.convs import ConvTranspose2dTorch
from arttts_tpu.models.unet2d import Downsample2d
from arttts_tpu.ops.updown_pallas import (
    conv_transpose2d_from_real64,
    conv_transpose2d_wide,
    downsample2d_to_real64,
    downsample2d_wide,
    pack_convt_params,
    pack_convt_wide_params,
    pack_downsample_params,
    pack_downsample_wide_params,
)
from arttts_tpu.ops.resblock2d_pallas import (
    PAD,
    pack_attn_params,
    pack_attn_params_wide,
    pack_block_params,
    pack_image,
    pack_resblock_params,
    pack_resblock_params_wide,
    pad_wide,
    resblock2d_packed,
    resblock2d_supported,
    resblock2d_wide,
    split_pack_image,
    unpack_image,
    unpad_wide,
)


def unet2d_fast_runtime_enabled() -> bool:
    """Default ON for TPU backends (settled r3: full 50-step loop 96.35 ms
    fast vs 109.38 ms XLA on v5e, B=1 80x768 — the all-or-nothing wiring
    with fused boundary kernels wins; the earlier hybrid wiring measured
    0.73x from layout poisoning, CLAUDE.md).  Kill switch:
    ARTTTS_DISABLE_UNET_PALLAS=1 falls back to the module's XLA path.
    The gate names TPU backends explicitly — the pltpu/Mosaic kernels
    only compile for TPU, so a GPU backend must fall back rather than
    crash at compile (ADVICE r3)."""
    if os.environ.get("ARTTTS_DISABLE_UNET_PALLAS", "0") not in ("", "0"):
        return False
    return jax.default_backend() in ("tpu", "axon")


def unet2d_fast_supported(cfg, T: int) -> bool:
    """Static gate: flagship U-Net geometry at a kernel-compatible length.

    cfg is a ModelConfig.  T is the frame-bucket length: both resolutions
    must tile by 128 (frame buckets are multiples of 256 in practice)."""
    d = cfg.decoder
    return (
        d.kind == "unet2d"
        and d.dim == 64
        and tuple(d.dim_mults) == (1, 2, 4)
        and d.groups == 8
        and d.compute_dtype == "float32"
        and cfg.n_feats % 4 == 0
        and T % 256 == 0
        and resblock2d_supported(T, cfg.n_feats // 2, 1)
        and resblock2d_supported(T // 2, cfg.n_feats // 2, 2, 128)
        and resblock2d_supported(T // 4, cfg.n_feats // 4, 2, 256)
    )


_warned_masked_norm = False


def _warn_masked_norm_once() -> None:
    """The fast path always computes masked GroupNorm statistics; with a
    masked_norm=False config (the reference default) outputs match the
    module only for unpadded batches — the B=1 serving protocol.  Padded
    batches on such configs silently diverge from the module path, so say
    it once (ADVICE r3)."""
    global _warned_masked_norm
    if not _warned_masked_norm:
        _warned_masked_norm = True
        import logging

        logging.getLogger(__name__).warning(
            "unet2d fast path with masked_norm=False config: GroupNorm "
            "statistics are masked; outputs equal the module path only for "
            "unpadded batches (B=1 serving). Set decoder.masked_norm=True "
            "for padding-exact batched serving, or "
            "ARTTTS_DISABLE_UNET_PALLAS=1 to force the module path."
        )


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def time_embedding(d, params, t) -> jnp.ndarray:
    """mish(MLP(sinusoidal(t))) time conditioning (unet2d.py:224-228;
    phases always f32 — bf16 phases at pe_scale=1000 are a multi-radian
    error, CLAUDE.md). Shared by the fast and sequence-parallel paths."""
    half = d.dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32)
        * -(math.log(10000.0) / (half - 1))
    )
    ang = d.pe_scale * t.astype(jnp.float32)[:, None] * freq[None, :]
    te = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    te = te @ params["Dense_0"]["kernel"] + params["Dense_0"]["bias"]
    t_emb = _mish(te) @ params["Dense_1"]["kernel"] + params["Dense_1"]["bias"]
    return _mish(t_emb)


def _bdot(a, b, out_dtype=jnp.float32):
    """Large attention contraction in bf16 with f32 accumulation — the
    same multiply precision XLA gives the model's convs on v5e; f32 dots
    here run at the slow 3-pass MXU rate and dominated the first fast-path
    A/B (r3 trace).

    out_dtype=bf16 for values whose only consumers are further bf16 dots:
    with an f32 output XLA materializes BOTH an f32 and a bf16 copy of the
    buffer (serving trace: the full-res qkv fusion wrote 144 MB/step)."""
    return jnp.matmul(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _beinsum(spec, a, b):
    return jnp.einsum(
        spec, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _attn_packed(p: dict, g: jnp.ndarray, xp: jnp.ndarray) -> jnp.ndarray:
    """Rezero(LinearAttention2d) on a packed padded buffer.

    Same math as `models/unet2d.py:125-165` laid out for the packed
    layout: the qkv / output projections become block-diag kron(I_2, W)
    matmuls, the per-channel softmax folds the two parity lanes, and the
    context matrix folds the two diagonal parity quadrants.  The PAD
    border columns are excluded from the softmax statistics (the module
    has no such columns); real padded frames stay included, exactly like
    the module.  heads=4, dim_head=32 (hd=128)."""
    B, P, Tp, _ = xp.shape
    W = p["Conv_0"]["kernel"].astype(jnp.float32)  # (64, 384)
    hd = 128
    Wq, Wk, Wv = W[:, :hd], W[:, hd : 2 * hd], W[:, 2 * hd :]
    z = jnp.zeros((64, hd), jnp.float32)
    # split projections by consumer dtype: k feeds f32 softmax statistics,
    # q/v feed bf16 contractions only — one combined f32 dot makes XLA
    # materialize both an f32 AND a bf16 copy of the (B,P,Tp,768) buffer
    Wk_big = jnp.concatenate(
        [
            jnp.concatenate([Wk, z], axis=1),
            jnp.concatenate([z, Wk], axis=1),
        ],
        axis=0,
    )  # (128, 256): [k0 k1]
    Wqv_big = jnp.concatenate(
        [
            jnp.concatenate([Wq, z, Wv, z], axis=1),
            jnp.concatenate([z, Wq, z, Wv], axis=1),
        ],
        axis=0,
    )  # (128, 512): [q0 q1 v0 v1]
    k = _bdot(xp, Wk_big)
    qv = _bdot(xp, Wqv_big, jnp.bfloat16)
    q = qv[..., : 2 * hd]
    v = qv[..., 2 * hd :]

    col = jnp.arange(Tp)
    bmask = ((col >= PAD) & (col < Tp - PAD)).astype(jnp.float32)[
        None, None, :, None
    ]
    # softmax is shift-invariant: the max may include the (zero) border
    # columns; only the exp-sum must exclude them
    m = jnp.max(k, axis=(1, 2), keepdims=True)
    m = jnp.maximum(m[..., :hd], m[..., hd:])
    m = jnp.concatenate([m, m], axis=-1)
    ke = jnp.exp(k - m) * bmask
    den = jnp.sum(ke, axis=(1, 2), keepdims=True)
    den = den[..., :hd] + den[..., hd:]
    den = jnp.concatenate([den, den], axis=-1)
    # bf16 output: kn's only consumer is the bf16 ctx contraction
    kn = (ke / den).astype(jnp.bfloat16)

    ctx = _beinsum("bptx,bpty->bxy", kn, v)
    ctx = ctx[:, :hd, :hd] + ctx[:, hd:, hd:]  # fold parity quadrants
    head = jnp.arange(hd) // 32
    ctx = jnp.where(head[:, None] == head[None, :], ctx, 0.0)

    out0 = _beinsum("bptd,bde->bpte", q[..., :hd], ctx)
    out1 = _beinsum("bptd,bde->bpte", q[..., hd:], ctx)
    Wp = p["Conv_1"]["kernel"]  # (128, 64)
    bp = p["Conv_1"]["bias"].astype(jnp.float32)
    proj = jnp.concatenate(
        [_bdot(out0, Wp), _bdot(out1, Wp)], axis=-1
    ) + jnp.concatenate([bp, bp])
    return xp + g.astype(jnp.float32) * proj


def _attn_wide(p: dict, g: jnp.ndarray, xw: jnp.ndarray) -> jnp.ndarray:
    """Rezero(LinearAttention2d) on a padded wide buffer (B, H, T+2*PAD, C):
    the module math verbatim (unet2d.py:125-165) with the PAD border
    columns excluded from the softmax statistics.  When the buffer is
    wider than the real channel count (real64 layout: 64 channels in 128
    lanes, upper half zero), the projections zero-pad to the buffer width
    so the layout is preserved."""
    B, H, Tp, C = xw.shape
    hd = 128
    W = p["Conv_0"]["kernel"]  # (real_c, 384)
    real_c = W.shape[0]
    if real_c < C:
        W = jnp.pad(W, ((0, C - real_c), (0, 0)))
    # k feeds f32 softmax statistics; q/v feed bf16 contractions only
    # (split avoids the double f32+bf16 materialization of one big dot)
    k = _bdot(xw, W[:, hd : 2 * hd])
    qv = _bdot(
        xw,
        jnp.concatenate([W[:, :hd], W[:, 2 * hd :]], axis=1),
        jnp.bfloat16,
    )
    q = qv[..., :hd]
    v = qv[..., hd:]

    col = jnp.arange(Tp)
    bmask = ((col >= PAD) & (col < Tp - PAD)).astype(jnp.float32)[
        None, None, :, None
    ]
    m = jnp.max(k, axis=(1, 2), keepdims=True)
    ke = jnp.exp(k - m) * bmask
    # bf16 output: kn's only consumer is the bf16 ctx contraction
    kn = (ke / jnp.sum(ke, axis=(1, 2), keepdims=True)).astype(jnp.bfloat16)
    ctx = _beinsum("bptx,bpty->bxy", kn, v)
    head = jnp.arange(hd) // 32
    ctx = jnp.where(head[:, None] == head[None, :], ctx, 0.0)
    out = _beinsum("bptd,bde->bpte", q, ctx)
    Wp = p["Conv_1"]["kernel"]
    bp = p["Conv_1"]["bias"].astype(jnp.float32)
    if real_c < C:
        Wp = jnp.pad(Wp, ((0, 0), (0, C - real_c)))
        bp = jnp.pad(bp, (0, C - real_c))
    proj = _bdot(out, Wp) + bp
    return xw + g.astype(jnp.float32) * proj


def score2d_fast(
    cfg,
    params: dict,
    xt: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    t: jnp.ndarray,
    spk_emb=None,
    interpret: bool = False,
    fuse_attn: bool = True,
    mid_kernels: Optional[bool] = None,
) -> jnp.ndarray:
    """Noise estimate on (B, T, n_feats) inputs; `params` is the
    estimator's param dict (`variables["params"]["estimator"]`).

    With `fuse_attn` the six Rezero(LinearAttention2d) sites run as two
    extra grid phases INSIDE the preceding resblock kernel (the XLA
    formulation cost ~520 us/step of bandwidth-bound fusions and
    destabilized the layouts around the custom calls); the XLA
    formulation stays for A/B via ARTTTS_UNET_FUSED_ATTN=0.

    With `mid_kernels` (r5, VERDICT r4 #4) the two remaining XLA ops in
    the body — Downsample2d_1 and ConvTranspose2dTorch_0 — run as wide
    Pallas kernels on the padded wide layout.  Hardware A/B (r5): the
    bare loop is a wash at B=1 and 4% WORSE at B=8, but the FULL serving
    program at B=1 is 2.4 ms FASTER with them (106.71 vs 109.08 ms —
    keeping the body all-kernels protects XLA's layouts in the larger
    program, the r3 "mixing domains" effect).  Default None = auto: ON at
    B == 1, OFF for batched inputs; ARTTTS_UNET_MID_KERNELS forces."""
    d = cfg.decoder
    B, T, F = xt.shape
    if mid_kernels is None:
        mid_kernels = B == 1  # see the docstring's hardware A/B
    dim = d.dim
    eps = 1e-5 if d.masked_norm else 1e-6

    def attn_p(k):
        # fused-attention params for site k (packed layout)
        if not fuse_attn:
            return None
        return pack_attn_params(
            params[f"LinearAttention2d_{k}"], params[f"Rezero_{k}"]["g"]
        )

    def attn_w(k, real64=False):
        if not fuse_attn:
            return None
        return pack_attn_params_wide(
            params[f"LinearAttention2d_{k}"], params[f"Rezero_{k}"]["g"],
            real64=real64,
        )

    def kernel(xs, lens, tv, prm, c_in, block_only=False, attn=None):
        return resblock2d_packed(
            xs, lens, tv, prm, c_in=c_in, block_only=block_only,
            eps=eps, interpret=interpret, attn_params=attn,
        )

    tmish = time_embedding(d, params, t)

    def tvec(pk):
        v = tmish @ pk["Dense_0"]["kernel"] + pk["Dense_0"]["bias"]
        return jnp.concatenate([v, v], axis=-1)  # (B, 128) packed

    mask_img = mask[:, None, :, :]  # (B, 1, T, 1)
    lengths = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)

    # ---- input planes --------------------------------------------------
    planes = [jnp.transpose(mu, (0, 2, 1)), jnp.transpose(xt, (0, 2, 1))]
    if cfg.n_spks > 1:
        s = spk_emb @ params["Dense_2"]["kernel"] + params["Dense_2"]["bias"]
        s = _mish(s) @ params["Dense_3"]["kernel"] + params["Dense_3"]["bias"]
        planes.append(jnp.broadcast_to(s[:, :, None], planes[0].shape))
    img = jnp.stack(planes, axis=-1)  # (B, F, T, c_in)
    c_in0 = img.shape[-1]

    # ---- level 1 down: fused kernels + packed attention ---------------
    hp = kernel(
        (pack_image(img * mask_img),), lengths,
        tvec(params["ResnetBlock2d_0"]),
        pack_resblock_params(params["ResnetBlock2d_0"], c_in0), c_in0,
    )
    hp = kernel(
        (hp,), lengths, tvec(params["ResnetBlock2d_1"]),
        pack_resblock_params(params["ResnetBlock2d_1"], 64), 64,
        attn=attn_p(0),
    )
    if not fuse_attn:
        hp = _attn_packed(
            params["LinearAttention2d_0"], params["Rezero_0"]["g"], hp
        )

    m2 = mask_img[:, :, ::2, :]
    m3 = m2[:, :, ::2, :]
    lengths2 = (lengths + 1) // 2
    lengths4 = (lengths2 + 1) // 2

    def rbw(name, c_out, c_chunks, xs_w, lens, attn=None):
        return resblock2d_wide(
            xs_w, lens, tvec_w(params[name], c_out),
            pack_resblock_params_wide(params[name], c_chunks, c_out),
            c_out=c_out, eps=eps, interpret=interpret, attn_params=attn,
        )

    def rbw2_entry(x64, lens):
        # ResnetBlock2d_2: 64 real channels arriving in a 128-lane buffer
        return resblock2d_wide(
            (x64,), lens, tvec_w(params["ResnetBlock2d_2"], 128),
            pack_resblock_params_wide(
                params["ResnetBlock2d_2"], (64,), 128, pad_in64=True
            ),
            c_out=128, c_chunks=(64,), eps=eps, interpret=interpret,
        )

    def tvec_w(pk, c_out):
        return tmish @ pk["Dense_0"]["kernel"] + pk["Dense_0"]["bias"]

    # ---- levels 2/3 + mid + first up: wide fused kernels --------------
    h = downsample2d_to_real64(
        hp, lengths, pack_downsample_params(params["Downsample2d_0"]),
        interpret=interpret,
    )  # (B, F/2, T/2+2*PAD, 128) real64
    h = rbw2_entry(h, lengths2)
    h = rbw("ResnetBlock2d_3", 128, (128,), (h,), lengths2, attn=attn_w(1))
    if not fuse_attn:
        h = _attn_wide(
            params["LinearAttention2d_1"], params["Rezero_1"]["g"], h
        )
    hid2 = h  # padded wide (B, F/2, T/2+2*PAD, 128)
    if mid_kernels:
        h = downsample2d_wide(
            h, lengths2,
            pack_downsample_wide_params(params["Downsample2d_1"]),
            interpret=interpret,
        )  # (B, F/4, T/4+2*PAD, 128) padded wide, masked internally
    else:
        h = pad_wide(
            Downsample2d(128).apply(
                {"params": params["Downsample2d_1"]}, unpad_wide(h) * m2
            )
        )  # (B, F/4, T/4, 128)
    h = rbw("ResnetBlock2d_4", 256, (128,), (h,), lengths4)
    h = rbw("ResnetBlock2d_5", 256, (256,), (h,), lengths4, attn=attn_w(2))
    if not fuse_attn:
        h = _attn_wide(
            params["LinearAttention2d_2"], params["Rezero_2"]["g"], h
        )
    hid3 = h

    h = rbw("ResnetBlock2d_6", 256, (256,), (h,), lengths4, attn=attn_w(3))
    if not fuse_attn:
        h = _attn_wide(
            params["LinearAttention2d_3"], params["Rezero_3"]["g"], h
        )
    h = rbw("ResnetBlock2d_7", 256, (256,), (h,), lengths4)

    h = rbw("ResnetBlock2d_8", 128, (256, 256), (h, hid3), lengths4)
    h = rbw("ResnetBlock2d_9", 128, (128,), (h,), lengths4, attn=attn_w(4))
    if not fuse_attn:
        h = _attn_wide(
            params["LinearAttention2d_4"], params["Rezero_4"]["g"], h
        )
    if mid_kernels:
        h = conv_transpose2d_wide(
            h, lengths4,
            pack_convt_wide_params(params["ConvTranspose2dTorch_0"]),
            interpret=interpret,
        )  # -> (B, F/2, T/2+2*PAD, 128) padded wide
    else:
        h = pad_wide(
            ConvTranspose2dTorch(128, 128, 4, 2, 1).apply(
                {"params": params["ConvTranspose2dTorch_0"]},
                unpad_wide(h) * m3,
            )
        )  # -> (B, F/2, T/2, 128)

    # ---- second up at half resolution: real64 wide kernels ------------
    # (64 output channels carried in 128-lane buffers, upper half zero:
    # no parity packing or lane slicing between kernels)
    def rbw64(name, c_chunks, xs_w, lens, attn=None):
        tv = jnp.pad(tvec_w(params[name], 64), ((0, 0), (0, 64)))
        return resblock2d_wide(
            xs_w, lens, tv,
            pack_resblock_params_wide(
                params[name], c_chunks, 64, real64=True
            ),
            c_out=64, c_chunks=c_chunks, eps=eps, interpret=interpret,
            real64=True, attn_params=attn,
        )

    hq = rbw64(
        "ResnetBlock2d_10", (128, 128), (h, hid2), lengths2
    )
    hq = rbw64(
        "ResnetBlock2d_11", (64,), (hq,), lengths2,
        attn=attn_w(5, real64=True),
    )
    if not fuse_attn:
        hq = _attn_wide(
            params["LinearAttention2d_5"], params["Rezero_5"]["g"], hq
        )
    h = conv_transpose2d_from_real64(
        hq, lengths, pack_convt_params(params["ConvTranspose2dTorch_1"]),
        interpret=interpret,
    )  # -> (B, F/2, T+2*PAD, 128) packed full-res

    # ---- final block + 1-channel projection, packed -------------------
    fp = kernel(
        (h,), lengths,
        jnp.zeros((B, 128), jnp.float32),
        pack_block_params(params["Block2d_0"]), 64, block_only=True,
    )
    wf = params["Conv_0"]["kernel"].astype(jnp.float32)  # (64, 1)
    zf = jnp.zeros_like(wf)
    w2 = jnp.concatenate(
        [jnp.concatenate([wf, zf], axis=1), jnp.concatenate([zf, wf], axis=1)],
        axis=0,
    )  # (128, 2): parity-separate single-channel outputs
    o = fp @ w2 + params["Conv_0"]["bias"]  # (B, F/2, T+2*PAD, 2)
    o = o[:, :, PAD:-PAD, :]
    out = jnp.transpose(o, (0, 1, 3, 2)).reshape(B, F, T)
    out = out * mask_img[:, 0, :, 0][:, None, :]
    return jnp.transpose(out, (0, 2, 1))  # (B, T, F)


def make_score_fn(
    model, variables, T: int, interpret: bool = False, sharded: bool = False,
    mesh=None, pallas=None,
):
    """Dispatch: the fused fast path when supported on this backend,
    otherwise the module's `estimate_noise`.  `model` is a GradTTSModel;
    T is the (static) frame-bucket length.

    `sharded=True` (the sequence-parallel sampler: frame axis split over a
    mesh's "model" axis) routes to the explicit-SPMD fast path
    (models/unet2d_sp.py: shard_map + packed math + halo/stat collectives)
    when the geometry supports it and `mesh` is given; otherwise the module
    path, which GSPMD partitions (the fused Pallas kernels themselves carry
    no sequence-sharding rules).

    `pallas`: None = auto (backend + ARTTTS_DISABLE_UNET_PALLAS);
    True/False force the fused/module formulation. Callers inside jit MUST
    thread this as a static argument rather than mutating the env — env
    gates read at trace time do not invalidate jit caches (the r5 bench
    aliasing incident, see `synthesize_to_wav`)."""
    cfg = model.config
    if sharded and mesh is not None:
        from arttts_tpu.models.unet2d_sp import (
            make_sp_score_fn,
            unet2d_sp_runtime_enabled,
            unet2d_sp_supported,
        )

        n_model = mesh.shape.get("model", 1)
        if unet2d_sp_supported(cfg, T, n_model) and (
            interpret or unet2d_sp_runtime_enabled()
        ):
            return make_sp_score_fn(model, variables, T, mesh)
    enabled = (
        (interpret or unet2d_fast_runtime_enabled()) if pallas is None
        else pallas
    )
    use_fast = (
        not sharded
        and unet2d_fast_supported(cfg, T)
        and enabled
    )
    if use_fast and not cfg.decoder.masked_norm:
        _warn_masked_norm_once()
    if not use_fast:
        return lambda xt, mask, mu, t, spk: model.apply(
            variables, xt, mask, mu, t, spk, method="estimate_noise"
        )

    est_params = variables["params"]["estimator"]
    fuse_attn = os.environ.get("ARTTTS_UNET_FUSED_ATTN", "1") not in (
        "", "0"
    )
    # Tri-state (r5 hardware A/B): unset -> auto by batch inside
    # score2d_fast (ON at B=1 where the full program wins 2.4 ms, OFF for
    # batched inputs where the bare loop loses 4%); "0"/"1" force.
    _mid_env = os.environ.get("ARTTTS_UNET_MID_KERNELS", "")
    mid_kernels = None if _mid_env == "" else _mid_env != "0"

    def score(xt, mask, mu, t, spk):
        emb = None
        if cfg.n_spks > 1:
            emb = model.apply(variables, spk, method="embed_speaker")
        return score2d_fast(
            cfg, est_params, xt, mask, mu, t, emb, interpret=interpret,
            fuse_attn=fuse_attn, mid_kernels=mid_kernels,
        )

    return score
