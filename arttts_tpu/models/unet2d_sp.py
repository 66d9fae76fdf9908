"""Sequence-parallel fast path for the 2D U-Net score network.

`score2d_fast` (models/unet2d_fast.py) carries no GSPMD sequence rules, so
sequence-parallel sampling (the T axis of the diffusion state sharded over a
mesh's "model" axis — SURVEY §5.7) used to fall back to the module path and
lose the fast-path math. This module is the explicit-SPMD formulation of the
SAME math under `shard_map`: each device holds a contiguous T-chunk in the
fast path's packed/wide layouts and

  * 3x3 convs exchange one-frame halos with `lax.ppermute` (zero-filled at
    the global sequence edges, exactly the zero padding the unsharded op
    sees);
  * masked GroupNorm statistics are local sums + `lax.psum` over the axis
    (global statistics, bit-comparable math);
  * the rezero linear attention takes its per-channel softmax max / exp-sum
    and its context matrix through `pmax`/`psum` (the context is a tiny
    (128, 128) — attention cost is local projections, not gathers);
  * stride-2 downsamples and the 4x4/2 ConvTranspose upsamples run the
    module on a halo-extended local chunk and slice the interior (parity
    kept by two-frame left halos at the stride-2 sites).

No Pallas here — the chunk-local compute is plain XLA on the packed layout
(full 128-lane dots, layout-stable buffers), which is testable on a virtual
CPU mesh and portable; kernelizing the chunk-local body is a later, purely
local optimization. Collective volume per step: 2 x (1-frame halo) per conv
site + four (B, 128)-ish stat vectors per block — all ICI-friendly.

Parity: tests/test_unet2d_sp.py pins this against `score2d_fast` (interpret)
and the module path on an 8-device mesh. Reference U-Net:
/root/reference/src/model/diffusion.py:140-252 (which has no multi-device
inference at all).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from arttts_tpu.models.convs import ConvTranspose2dTorch
from arttts_tpu.models.unet2d import Downsample2d
from arttts_tpu.models.unet2d_fast import time_embedding
from arttts_tpu.ops.resblock2d_pallas import (
    C_HALF,
    LANES,
    pack_image,
    pack_resblock_params,
    pack_block_params,
    unpack_image,
)

try:  # jax>=0.8 promotes shard_map to the public namespace
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def unet2d_sp_runtime_enabled() -> bool:
    """The SP path is plain XLA (no Mosaic), so it is safe on every backend;
    ARTTTS_DISABLE_UNET_SP=1 forces the module path (GSPMD partitioning)."""
    return os.environ.get("ARTTTS_DISABLE_UNET_SP", "0") in ("", "0")


def unet2d_sp_supported(cfg, T: int, n_shards: int) -> bool:
    """Flagship U-Net geometry with a T-chunk per device that survives two
    stride-2 levels (chunk length divisible by 4)."""
    d = cfg.decoder
    return (
        d.kind == "unet2d"
        and d.dim == 64
        and tuple(d.dim_mults) == (1, 2, 4)
        and d.groups == 8
        and d.compute_dtype == "float32"
        and cfg.n_feats % 4 == 0
        and n_shards > 1
        and T % n_shards == 0
        and (T // n_shards) % 4 == 0
    )


# ---------------------------------------------------------------------------
# collective helpers (inside shard_map; `axis` is the mesh axis name)
# ---------------------------------------------------------------------------


def _from_left(x, n: int, axis: str, width: int):
    """Last `width` frames of the LEFT neighbor's chunk (zeros on shard 0 —
    the global sequence edge, where the unsharded conv also reads zeros)."""
    return jax.lax.ppermute(
        x[:, :, -width:, :], axis, [(i, i + 1) for i in range(n - 1)]
    )


def _from_right(x, n: int, axis: str, width: int):
    return jax.lax.ppermute(
        x[:, :, :width, :], axis, [(i + 1, i) for i in range(n - 1)]
    )


def _shift_t(x, left1, right1, dt: int):
    """Frame tap x[t + dt] for dt in {-1, 0, 1} given one-frame halos."""
    if dt == -1:
        return jnp.concatenate([left1, x[:, :, :-1, :]], axis=2)
    if dt == 1:
        return jnp.concatenate([x[:, :, 1:, :], right1], axis=2)
    return x


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _dot(a, w, out_dtype=jnp.float32):
    # bf16 multiply, f32 accumulate — the same mode XLA gives these convs
    # on v5e and the mode the fused kernels use
    return jnp.matmul(
        a.astype(jnp.bfloat16), jnp.asarray(w).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _conv3x3_packed_sp(x, w, n: int, axis: str):
    """3x3 conv on the h-parity packed local chunk (B, P, T_l, 128) using
    the packed dot matrices (`pack_conv3x3`): per frame tap one dense
    same-pair dot + one composite cross-pair dot. Bias NOT applied."""

    def hcomp(v):
        zrow = jnp.zeros_like(v[:, :1])
        v_up = jnp.concatenate([v[:, 1:], zrow], axis=1)
        v_dn = jnp.concatenate([zrow, v[:, :-1]], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
        return jnp.where(lane < C_HALF, v_up, v_dn)

    left = _from_left(x, n, axis, 1)
    right = _from_right(x, n, axis, 1)
    comp, comp_l, comp_r = hcomp(x), hcomp(left), hcomp(right)
    acc = None
    for it in range(3):
        dt = it - 1
        a = _shift_t(x, left, right, dt)
        e = _shift_t(comp, comp_l, comp_r, dt)
        part = _dot(a, w[it, 0]) + _dot(e, w[it, 1])
        acc = part if acc is None else acc + part
    return acc


def _conv3x3_wide_sp(x, w, n: int, axis: str):
    """3x3 conv on an unpacked local chunk (B, H, T_l, C_in) with HWIO
    weights (3, 3, C_in, C_out). Bias NOT applied."""
    left = _from_left(x, n, axis, 1)
    right = _from_right(x, n, axis, 1)
    zrow = jnp.zeros_like(x[:, :1])
    acc = None
    for kt in range(3):
        xt_ = _shift_t(x, left, right, kt - 1)
        for kh in range(3):
            dh = kh - 1
            if dh == -1:
                xh = jnp.concatenate([zrow, xt_[:, :-1]], axis=1)
            elif dh == 1:
                xh = jnp.concatenate([xt_[:, 1:], zrow], axis=1)
            else:
                xh = xt_
            part = _dot(xh, w[kh, kt])
            acc = part if acc is None else acc + part
    return acc


def _group_fold_matrix(lanes: int, packed: bool):
    """(lanes, lanes) 0/1 matrix summing per-lane stats into per-group
    totals broadcast back to lanes. GroupNorm has 8 GROUPS of C/8 channels
    (group width = lanes // 8 in the wide layout; the packed layout's 64
    channels give width-8 groups, with a channel's two parities at lane c
    and lane 64 + c)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    if packed:
        same = (lane % C_HALF) // 8 == (lane_t % C_HALF) // 8
    else:
        gw = lanes // 8
        same = lane // gw == lane_t // gw
    return same.astype(jnp.float32)


def _gn_sp(h, scale, bias, count, n: int, axis: str, eps: float,
           packed: bool):
    """Masked GroupNorm with GLOBAL statistics: local sums over (rows, T_l)
    + psum over the sequence axis. `h` must already be masked; `count` is
    the per-group valid-element count (B,)."""
    lanes = h.shape[-1]
    s1 = jax.lax.psum(jnp.sum(h, axis=(1, 2)), axis)  # (B, lanes)
    s2 = jax.lax.psum(jnp.sum(h * h, axis=(1, 2)), axis)
    fold = _group_fold_matrix(lanes, packed)
    s1 = s1 @ fold
    s2 = s2 @ fold
    cnt = count[:, None]
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    mean = mean[:, None, None, :]
    rstd = jax.lax.rsqrt(var + eps)[:, None, None, :]
    return (h - mean) * rstd * jnp.asarray(scale)[None, None, None, :] + (
        jnp.asarray(bias)[None, None, None, :]
    )


def _resblock_packed_sp(
    p_flat, c_in: int, xs, mask4, temb, count, n: int, axis: str, eps: float
):
    """Fused-path ResnetBlock2d math on packed local chunks.

    p_flat: `pack_resblock_params` output. xs: tuple of (B, P, T_l, 128)
    packed 64-channel input chunks (masked). mask4: (B, 1, T_l, 1).
    temb: (B, 128) packed time rows. Returns (B, P, T_l, 128) masked."""
    n_in = len(xs)
    pos = 0
    w1s = p_flat[pos : pos + n_in]; pos += n_in
    b1, g1s, g1b = p_flat[pos : pos + 3]; pos += 3
    w2 = p_flat[pos]; pos += 1
    b2, g2s, g2b = p_flat[pos : pos + 3]; pos += 3
    identity = c_in == C_HALF
    if not identity:
        wres = p_flat[pos : pos + n_in]; pos += n_in
        bres = p_flat[pos]

    acc = None
    for j in range(n_in):
        part = _conv3x3_packed_sp(xs[j], w1s[j], n, axis)
        acc = part if acc is None else acc + part
    h1 = (acc + b1) * mask4
    hn = _gn_sp(h1, g1s[0], g1b[0], count, n, axis, eps, packed=True)
    hp = (_mish(hn) + temb[:, None, None, :]) * mask4
    h2 = (_conv3x3_packed_sp(hp, w2, n, axis) + b2) * mask4
    y = _mish(
        _gn_sp(h2, g2s[0], g2b[0], count, n, axis, eps, packed=True)
    ) * mask4
    if identity:
        res = xs[0]
    else:
        res = None
        for j in range(n_in):
            part = _dot(xs[j], wres[j])
            res = part if res is None else res + part
        # Dense bias applies everywhere, padding included (the module adds
        # it unmasked, unet2d.py:119; the next consumer masks its input)
        res = res + bres
    return y + res


def _block_packed_sp(p_flat, x, mask4, count, n, axis, eps):
    """Final Block2d (conv + GN + mish, no temb/residual) on the packed
    layout — `pack_block_params` weights."""
    w1, b1, g1s, g1b = p_flat
    h1 = (_conv3x3_packed_sp(x, w1, n, axis) + b1) * mask4
    return _mish(
        _gn_sp(h1, g1s[0], g1b[0], count, n, axis, eps, packed=True)
    ) * mask4


def _resblock_wide_sp(
    p, c_chunks, c_out: int, xs, mask4, temb, count, n: int, axis: str,
    eps: float,
):
    """ResnetBlock2d math on unpacked local chunks (B, H, T_l, c_j) with
    raw HWIO weights; skip-concats never materialize (per-chunk conv /
    residual dots)."""
    bl0, bl1 = p["Block2d_0"], p["Block2d_1"]
    w1 = bl0["Conv_0"]["kernel"]
    offs = np.cumsum((0,) + tuple(c_chunks))
    acc = None
    for j in range(len(c_chunks)):
        part = _conv3x3_wide_sp(
            xs[j], w1[:, :, offs[j] : offs[j + 1]], n, axis
        )
        acc = part if acc is None else acc + part
    h1 = (acc + jnp.asarray(bl0["Conv_0"]["bias"])) * mask4
    hn = _gn_sp(
        h1, bl0["GroupNorm_0"]["scale"], bl0["GroupNorm_0"]["bias"],
        count, n, axis, eps, packed=False,
    )
    hp = (_mish(hn) + temb[:, None, None, :]) * mask4
    h2 = (
        _conv3x3_wide_sp(hp, bl1["Conv_0"]["kernel"], n, axis)
        + jnp.asarray(bl1["Conv_0"]["bias"])
    ) * mask4
    y = _mish(
        _gn_sp(
            h2, bl1["GroupNorm_0"]["scale"], bl1["GroupNorm_0"]["bias"],
            count, n, axis, eps, packed=False,
        )
    ) * mask4
    if c_chunks == (c_out,):
        res = xs[0]
    else:
        wres = p["Conv_0"]["kernel"]
        res = None
        for j in range(len(c_chunks)):
            part = _dot(xs[j], wres[offs[j] : offs[j + 1]])
            res = part if res is None else res + part
        res = res + jnp.asarray(p["Conv_0"]["bias"])
    return y + res


def _attn_packed_sp(p, g, xp, n: int, axis: str):
    """Rezero(LinearAttention2d) on the packed local chunk: the
    `unet2d_fast._attn_packed` math with the global softmax statistics and
    the context matrix taken through pmax/psum (no PAD border columns in
    the SP layout). heads=4, dim_head=32 (hd=128)."""
    W = jnp.asarray(p["Conv_0"]["kernel"], jnp.float32)  # (64, 384)
    hd = 128
    Wq, Wk, Wv = W[:, :hd], W[:, hd : 2 * hd], W[:, 2 * hd :]
    z = jnp.zeros((C_HALF, hd), jnp.float32)
    Wk_big = jnp.concatenate(
        [jnp.concatenate([Wk, z], 1), jnp.concatenate([z, Wk], 1)], 0
    )  # (128, 256)
    Wqv_big = jnp.concatenate(
        [
            jnp.concatenate([Wq, z, Wv, z], 1),
            jnp.concatenate([z, Wq, z, Wv], 1),
        ],
        0,
    )  # (128, 512)
    k = _dot(xp, Wk_big)
    qv = _dot(xp, Wqv_big, jnp.bfloat16)
    q, v = qv[..., : 2 * hd], qv[..., 2 * hd :]

    m = jnp.max(k, axis=(1, 2), keepdims=True)
    m = jax.lax.pmax(m, axis)
    m = jnp.maximum(m[..., :hd], m[..., hd:])
    m = jnp.concatenate([m, m], axis=-1)
    ke = jnp.exp(k - m)
    den = jax.lax.psum(jnp.sum(ke, axis=(1, 2), keepdims=True), axis)
    den = den[..., :hd] + den[..., hd:]
    den = jnp.concatenate([den, den], axis=-1)
    kn = (ke / den).astype(jnp.bfloat16)

    ctx = jnp.einsum(
        "bptx,bpty->bxy", kn, v, preferred_element_type=jnp.float32
    )
    ctx = jax.lax.psum(ctx, axis)
    ctx = ctx[:, :hd, :hd] + ctx[:, hd:, hd:]
    head = jnp.arange(hd) // 32
    ctx = jnp.where(head[:, None] == head[None, :], ctx, 0.0).astype(
        jnp.bfloat16
    )

    def bein(a, b):
        return jnp.einsum(
            "bptd,bde->bpte", a, b, preferred_element_type=jnp.float32
        )

    out0 = bein(q[..., :hd], ctx)
    out1 = bein(q[..., hd:], ctx)
    Wp = p["Conv_1"]["kernel"]
    bp = jnp.asarray(p["Conv_1"]["bias"], jnp.float32)
    proj = jnp.concatenate(
        [_dot(out0, Wp), _dot(out1, Wp)], axis=-1
    ) + jnp.concatenate([bp, bp])
    return xp + jnp.asarray(g, jnp.float32) * proj


def _attn_wide_sp(p, g, xw, n: int, axis: str):
    """Rezero(LinearAttention2d) on an unpacked local chunk
    (B, H, T_l, C) — `unet2d_fast._attn_wide` with collective stats."""
    hd = 128
    W = jnp.asarray(p["Conv_0"]["kernel"], jnp.float32)
    k = _dot(xw, W[:, hd : 2 * hd])
    qv = _dot(
        xw, jnp.concatenate([W[:, :hd], W[:, 2 * hd :]], 1), jnp.bfloat16
    )
    q, v = qv[..., :hd], qv[..., hd:]
    m = jax.lax.pmax(jnp.max(k, axis=(1, 2), keepdims=True), axis)
    ke = jnp.exp(k - m)
    den = jax.lax.psum(jnp.sum(ke, axis=(1, 2), keepdims=True), axis)
    kn = (ke / den).astype(jnp.bfloat16)
    ctx = jax.lax.psum(
        jnp.einsum("bptx,bpty->bxy", kn, v, preferred_element_type=jnp.float32),
        axis,
    )
    head = jnp.arange(hd) // 32
    ctx = jnp.where(head[:, None] == head[None, :], ctx, 0.0).astype(
        jnp.bfloat16
    )
    out = jnp.einsum(
        "bptd,bde->bpte", q, ctx, preferred_element_type=jnp.float32
    )
    proj = _dot(out, p["Conv_1"]["kernel"]) + jnp.asarray(
        p["Conv_1"]["bias"], jnp.float32
    )
    return xw + jnp.asarray(g, jnp.float32) * proj


def _downsample_sp(params, dim: int, x, n: int, axis: str):
    """Stride-2 3x3 conv (`Downsample2d`) on a halo-extended local chunk:
    a TWO-frame left halo keeps the stride-2 output grid's parity, the
    module computes on the extension, and the interior slice drops the
    (edge-corrupt) first output frame. x: (B, H, T_l, C) masked, T_l even."""
    left2 = _from_left(x, n, axis, 2)
    ext = jnp.concatenate([left2, x], axis=2)  # (B, H, T_l + 2, C)
    out = Downsample2d(dim).apply({"params": params}, ext)
    return out[:, :, 1:, :]  # (B, H/2, T_l/2, C)


def _conv_transpose_sp(params, c: int, x, n: int, axis: str):
    """4x4 stride-2 pad-1 ConvTranspose2dTorch on a one-frame-halo-extended
    local chunk; the interior slice [2 : 2 + 2*T_l] is exactly the chunk's
    global output rows. x: (B, H, T_l, C) masked."""
    left1 = _from_left(x, n, axis, 1)
    right1 = _from_right(x, n, axis, 1)
    ext = jnp.concatenate([left1, x, right1], axis=2)
    out = ConvTranspose2dTorch(c, c, 4, 2, 1).apply({"params": params}, ext)
    T2 = 2 * x.shape[2]
    return out[:, :, 2 : 2 + T2, :]


def score2d_sp(
    cfg,
    params: dict,
    xt: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    t: jnp.ndarray,
    spk_emb,
    n: int,
    axis: str = "model",
) -> jnp.ndarray:
    """Noise estimate on LOCAL shards (B, T_l, n_feats) inside shard_map.
    Mirrors `score2d_fast`'s structure level for level; all global
    statistics go through collectives. Returns the local (B, T_l, n_feats)
    output shard."""
    d = cfg.decoder
    B, T_l, F = xt.shape
    eps = 1e-5 if d.masked_norm else 1e-6
    tmish = time_embedding(d, params, t)

    def tvec(pk):
        v = tmish @ pk["Dense_0"]["kernel"] + pk["Dense_0"]["bias"]
        return jnp.concatenate([v, v], axis=-1)  # (B, 128) packed

    def tvec_w(pk):
        return tmish @ pk["Dense_0"]["kernel"] + pk["Dense_0"]["bias"]

    mask4 = mask[:, None, :, :]  # (B, 1, T_l, 1)
    length = jax.lax.psum(jnp.sum(mask[..., 0], axis=1), axis)  # (B,) global

    planes = [jnp.transpose(mu, (0, 2, 1)), jnp.transpose(xt, (0, 2, 1))]
    if cfg.n_spks > 1:
        s = spk_emb @ params["Dense_2"]["kernel"] + params["Dense_2"]["bias"]
        s = _mish(s) @ params["Dense_3"]["kernel"] + params["Dense_3"]["bias"]
        planes.append(jnp.broadcast_to(s[:, :, None], planes[0].shape))
    img = jnp.stack(planes, axis=-1)  # (B, F, T_l, c_in)
    c_in0 = img.shape[-1]
    n_pairs = F // 2

    # per-group valid elements (kernel: rows x group-width x valid frames)
    cnt_packed = n_pairs * 2 * 8 * length

    def cnt_wide(H, lanes):
        return H * (lanes // 8) * length

    # ---- level 1 (packed, full resolution) ------------------------------
    hp = _resblock_packed_sp(
        pack_resblock_params(params["ResnetBlock2d_0"], c_in0), c_in0,
        (pack_image(img * mask4, pad=False),), mask4,
        tvec(params["ResnetBlock2d_0"]), cnt_packed, n, axis, eps,
    )
    hp = _resblock_packed_sp(
        pack_resblock_params(params["ResnetBlock2d_1"], 64), 64,
        (hp,), mask4, tvec(params["ResnetBlock2d_1"]), cnt_packed, n, axis,
        eps,
    )
    hp = _attn_packed_sp(
        params["LinearAttention2d_0"], params["Rezero_0"]["g"], hp, n, axis
    )

    m2 = mask4[:, :, ::2, :]
    m3 = m2[:, :, ::2, :]
    length2 = jnp.ceil(length / 2)
    length4 = jnp.ceil(length2 / 2)

    # ---- level 2 (wide 64 -> 128) ---------------------------------------
    h = unpack_image(hp * mask4, C=64, padded=False)  # (B, F, T_l, 64)
    h = _downsample_sp(
        params["Downsample2d_0"], 64, h * mask4, n, axis
    )  # (B, F/2, T_l/2, 64)
    H2 = F // 2

    def rbw(name, c_chunks, c_out, xs):
        return _resblock_wide_sp(
            params[name], c_chunks, c_out, xs, m2,
            tvec_w(params[name]), H2 * (c_out // 8) * length2, n, axis, eps,
        )

    h = rbw("ResnetBlock2d_2", (64,), 128, (h * m2,))
    h = rbw("ResnetBlock2d_3", (128,), 128, (h * m2,))
    h = _attn_wide_sp(
        params["LinearAttention2d_1"], params["Rezero_1"]["g"], h, n, axis
    )
    hid2 = h  # (B, F/2, T_l/2, 128)

    # ---- level 3 + mid (wide 128 -> 256) --------------------------------
    h = _downsample_sp(params["Downsample2d_1"], 128, h * m2, n, axis)
    H4 = F // 4

    def rbw4(name, c_chunks, c_out, xs, attn_k=None):
        cnt = H4 * (c_out // 8) * length4
        y = _resblock_wide_sp(
            params[name], c_chunks, c_out,
            tuple(x * m3 for x in xs), m3, tvec_w(params[name]), cnt, n,
            axis, eps,
        )
        if attn_k is not None:
            y = _attn_wide_sp(
                params[f"LinearAttention2d_{attn_k}"],
                params[f"Rezero_{attn_k}"]["g"], y, n, axis,
            )
        return y

    h = rbw4("ResnetBlock2d_4", (128,), 256, (h,))
    h = rbw4("ResnetBlock2d_5", (256,), 256, (h,), attn_k=2)
    hid3 = h
    h = rbw4("ResnetBlock2d_6", (256,), 256, (h,), attn_k=3)
    h = rbw4("ResnetBlock2d_7", (256,), 256, (h,))

    # ---- up path ---------------------------------------------------------
    h = rbw4("ResnetBlock2d_8", (256, 256), 128, (h, hid3))
    h = rbw4("ResnetBlock2d_9", (128,), 128, (h,), attn_k=4)
    h = _conv_transpose_sp(
        params["ConvTranspose2dTorch_0"], 128, h * m3, n, axis
    )  # (B, F/2, T_l/2, 128)

    def rbw2(name, c_chunks, c_out, xs, attn_k=None):
        cnt = H2 * (c_out // 8) * length2
        y = _resblock_wide_sp(
            params[name], c_chunks, c_out,
            tuple(x * m2 for x in xs), m2, tvec_w(params[name]), cnt, n,
            axis, eps,
        )
        if attn_k is not None:
            y = _attn_wide_sp(
                params[f"LinearAttention2d_{attn_k}"],
                params[f"Rezero_{attn_k}"]["g"], y, n, axis,
            )
        return y

    h = rbw2("ResnetBlock2d_10", (128, 128), 64, (h, hid2))
    h = rbw2("ResnetBlock2d_11", (64,), 64, (h,), attn_k=5)
    h = _conv_transpose_sp(
        params["ConvTranspose2dTorch_1"], 64, h * m2, n, axis
    )  # (B, F, T_l, 64)

    # ---- final block + 1-channel projection (packed) --------------------
    fp = _block_packed_sp(
        pack_block_params(params["Block2d_0"]),
        pack_image(h * mask4, pad=False), mask4, cnt_packed, n, axis, eps,
    )
    wf = jnp.asarray(params["Conv_0"]["kernel"], jnp.float32)  # (64, 1)
    zf = jnp.zeros_like(wf)
    w2 = jnp.concatenate(
        [jnp.concatenate([wf, zf], 1), jnp.concatenate([zf, wf], 1)], 0
    )  # (128, 2)
    o = fp @ w2 + params["Conv_0"]["bias"]  # (B, F/2, T_l, 2)
    out = jnp.transpose(o, (0, 1, 3, 2)).reshape(B, F, T_l)
    out = out * mask4[:, 0, :, 0][:, None, :]
    return jnp.transpose(out, (0, 2, 1))  # (B, T_l, F)


def make_sp_score_fn(model, variables, T: int, mesh, axis: str = "model"):
    """Sequence-parallel score function: inputs (B, T, n_feats) sharded on T
    over `axis`; the whole U-Net runs as explicit SPMD via shard_map with
    the fast path's packed math. Caller guarantees
    `unet2d_sp_supported(cfg, T, mesh.shape[axis])`."""
    cfg = model.config
    est_params = variables["params"]["estimator"]
    n = mesh.shape[axis]
    seq = P(None, axis, None)

    if cfg.n_spks > 1:

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(seq, seq, seq, P(), P()),
            out_specs=seq,
        )
        def fn(xt, mask, mu, t, emb):
            return score2d_sp(
                cfg, est_params, xt, mask, mu, t, emb, n, axis
            )

        fn = jax.jit(fn)  # see the jit note on the single-speaker return

        def score(xt, mask, mu, t, spk):
            emb = model.apply(variables, spk, method="embed_speaker")
            return fn(xt, mask, mu, t, emb)

        return score

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(seq, seq, seq, P()),
        out_specs=seq,
    )
    def fn(xt, mask, mu, t):
        return score2d_sp(cfg, est_params, xt, mask, mu, t, None, n, axis)

    # jit the shard_map: inside the jitted samplers this is a no-op, but a
    # DIRECT eager call would otherwise execute the whole U-Net op-by-op —
    # with PALLAS_AXON_REMOTE_COMPILE=1 that floods the remote compile
    # queue with hundreds of per-op jobs (r5 incident: a mesh=(1,)
    # hardware check called it bare and starved the queue for 40 min,
    # exactly the r4 eager-init trap; CLAUDE.md "Environment gotchas").
    fn = jax.jit(fn)
    return lambda xt, mask, mu, t, spk: fn(xt, mask, mu, t)
