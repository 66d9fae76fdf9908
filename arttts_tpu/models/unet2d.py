"""2D U-Net score estimator for the diffusion decoder.

Equivalent of `GradLogPEstimator2d` (`/root/reference/src/model/diffusion.py:
140-252`): the (mu, x_t[, spk]) stack is treated as a 2-/3-channel image of
shape (n_feats, T); three resolutions (dim_mults 1,2,4) of
[ResnetBlock x2, rezero linear attention, down/upsample]; a time MLP over a
sinusoidal embedding (pe_scale 1000); masks coarsened by striding the frame
axis at each downsampling (diffusion.py:233).

TPU-first layout: NHWC images `(B, n_feats, T, C)` so 3x3 convs lower to MXU
convolutions with channels on lanes; mask is `(B, 1, T, 1)` and broadcasts
across the feature-height axis.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from arttts_tpu.models.convs import ConvTranspose2dTorch


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """diffusion.py:125-137."""

    dim: int

    def __call__(self, t, scale: float = 1000.0):
        half_dim = self.dim // 2
        freq = jnp.exp(
            jnp.arange(half_dim, dtype=jnp.float32) * -(math.log(10000.0) / (half_dim - 1))
        ).astype(t.dtype)
        emb = scale * t[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics exclude padded frames.

    The reference's plain GroupNorm mixes padding into the per-group
    statistics, which is why its inference runs at batch size 1
    (`arttts_inference.py:227-231`). With `mask` (B, 1, T, 1) the mean/var
    are computed over valid positions only, so a padded batched forward is
    exactly equivalent to per-sample unpadded forwards — enabling real
    batched serving on TPU.

    Statistics are always accumulated in float32 (bf16 sums over 80*768
    positions lose ~3 decimal digits); the normalized output is cast back
    to the input dtype.
    """

    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        B, H, W, C = x.shape
        G = self.num_groups
        Cg = C // G
        xg = x.reshape(B, H, W, G, Cg)
        xs = xg.astype(jnp.float32)
        mg = mask.astype(jnp.float32)[..., None]  # (B, 1, T, 1, 1)
        # single-pass masked statistics: E[x], E[x^2] over valid positions
        count = jnp.sum(mg, axis=(1, 2, 3, 4)).reshape(B, 1, 1, 1, 1) * (H * Cg)
        s1 = jnp.sum(xs * mg, axis=(1, 2, 4), keepdims=True)
        s2 = jnp.sum(jnp.square(xs) * mg, axis=(1, 2, 4), keepdims=True)
        mean = s1 / count
        var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
        xs = (xs - mean) * jax.lax.rsqrt(var + self.epsilon)
        x = xs.reshape(B, H, W, C)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return (x * scale + bias).astype(xg.dtype)


class Block2d(nn.Module):
    """conv3x3 -> GroupNorm(8) -> Mish, masked in/out (diffusion.py:52-65).

    `masked_norm` switches to padding-exact GroupNorm statistics."""

    dim_out: int
    groups: int = 8
    masked_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype)(x * mask)
        if self.masked_norm:
            h = MaskedGroupNorm(num_groups=self.groups, name="GroupNorm_0")(h, mask)
        else:
            h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(h)
        return mish(h) * mask


class ResnetBlock2d(nn.Module):
    """Two blocks + time-MLP injection + 1x1 residual (diffusion.py:68-85)."""

    dim_out: int
    groups: int = 8
    masked_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = Block2d(self.dim_out, self.groups, self.masked_norm, self.dtype)(x, mask)
        t = nn.Dense(self.dim_out, dtype=self.dtype)(mish(time_emb))  # (B, dim_out)
        h = h + t[:, None, None, :]
        h = Block2d(self.dim_out, self.groups, self.masked_norm, self.dtype)(h, mask)
        if x.shape[-1] != self.dim_out:
            res = nn.Dense(self.dim_out, name="Conv_0", dtype=self.dtype)(x * mask)
        else:
            res = x * mask
        return h + res


class LinearAttention2d(nn.Module):
    """Softmax-k linear attention over the (n_feats x T) plane
    (diffusion.py:88-112).

    MXU note: the naive per-head einsums contract with M=N=dim_head=32,
    wasting 4x4 of every 128x128 systolic tile. Instead both contractions
    run at the full head*dim width (128) and the cross-head terms are
    removed with a block-diagonal mask on the context matrix — identical
    math, full MXU tiles.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = self.heads * self.dim_head
        # 1x1 convs lower to spatially-partitioned TPU convolutions with
        # large layout copies; a Dense over the channel axis is the same
        # math as one clean matmul. All ops below stay in the native
        # (B, H, W, channels) layout — no spatial flattening reshapes (TPU
        # tiled layouts turn those into real copies).
        qkv = nn.Dense(hd * 3, use_bias=False, name="Conv_0", dtype=self.dtype)(x)
        q = qkv[..., :hd]
        k = qkv[..., hd : 2 * hd]
        v = qkv[..., 2 * hd :]
        # softmax over all spatial positions, independently per channel —
        # identical to the per-(head, dim) softmax of the flattened form
        k = k.astype(jnp.float32)
        k = k - jnp.max(k, axis=(1, 2), keepdims=True)
        k = jnp.exp(k)
        k = (k / jnp.sum(k, axis=(1, 2), keepdims=True)).astype(v.dtype)
        # full-width context (B, h*d, h*d); only diagonal head blocks are real
        context = jnp.einsum("bhwd,bhwe->bde", k, v)
        blk = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // self.dim_head
        blk_t = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // self.dim_head
        context = jnp.where(blk == blk_t, context, 0.0)
        out = jnp.einsum("bde,bhwd->bhwe", context, q)  # (B, H, W, h*d)
        return nn.Dense(C, name="Conv_1", dtype=self.dtype)(out)


class Rezero(nn.Module):
    """Residual(Rezero(fn)): x + g * fn(x), g zero-init (diffusion.py:39-49)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.zeros, (1,))
        return x + self.fn(x) * g.astype(x.dtype)


class Downsample2d(nn.Module):
    """conv 3x3 stride 2 pad 1 (diffusion.py:30-36)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=self.dtype)(x)


class GradLogPEstimator2d(nn.Module):
    """U-Net noise estimator. Inputs in `(B, T, n_feats)`; internally NHWC
    images `(B, n_feats, T, C)`."""

    dim: int
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    groups: int = 8
    n_spks: int = 1
    spk_emb_dim: int = 64
    n_feats: int = 80
    pe_scale: int = 1000
    masked_norm: bool = False
    use_preblock: bool = False  # Diffusion1DPreblock: wide (1,9) conv +
    preblock_kernel: int = 9    # channel attention before the downs
    # "bfloat16" halves the HBM traffic of the bandwidth-bound B=1 serving
    # loop and removes XLA's per-conv f32<->bf16 layout copies; params stay
    # f32 (checkpoint-compatible) and all normalization statistics are
    # accumulated in f32 (MaskedGroupNorm / flax GroupNorm / attention
    # softmax). Default f32 = bit-identical to the pre-dtype code.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, mu, t, spk: Optional[jnp.ndarray] = None):
        """x, mu: (B, T, n_feats); mask: (B, T, 1); t: (B,). Returns (B, T, n_feats)."""
        assert x.shape[1] % 2 ** (len(self.dim_mults) - 1) == 0, (
            f"frame axis {x.shape[1]} must be divisible by "
            f"{2 ** (len(self.dim_mults) - 1)} (use fix_len_compatibility)"
        )
        cdt = jnp.dtype(self.compute_dtype)
        in_dtype = x.dtype
        x, mask, mu = x.astype(cdt), mask.astype(cdt), mu.astype(cdt)
        # positional phases scale*t*freq reach O(1000): computing them in
        # bf16 is a multi-radian phase error — always f32, cast the result
        t_emb = SinusoidalPosEmb(self.dim)(
            t.astype(jnp.float32), scale=self.pe_scale
        ).astype(cdt)
        t_emb = nn.Dense(self.dim * 4, dtype=cdt)(t_emb)
        t_emb = nn.Dense(self.dim, dtype=cdt)(mish(t_emb))

        # (B, T, F) -> image (B, F, T, C)
        planes = [jnp.transpose(mu, (0, 2, 1)), jnp.transpose(x, (0, 2, 1))]
        if self.n_spks > 1:
            assert spk is not None
            spk = spk.astype(cdt)
            s = nn.Dense(self.spk_emb_dim * 4, dtype=cdt)(spk)
            s = nn.Dense(self.n_feats, dtype=cdt)(mish(s))  # (B, n_feats)
            planes.append(jnp.broadcast_to(s[:, :, None], planes[0].shape))
        h = jnp.stack(planes, axis=-1)  # (B, F, T, 2 or 3)
        mask_img = mask[:, None, :, :]  # (B, 1, T, 1)

        if self.use_preblock:
            from arttts_tpu.models.unet1d import PreBlock

            h = PreBlock(h.shape[-1], self.preblock_kernel)(h, mask_img)

        dims = [h.shape[-1]] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        hiddens = []
        masks = [mask_img]
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            m = masks[-1]
            h = ResnetBlock2d(dim_out, self.groups, self.masked_norm, cdt)(h, m, t_emb)
            h = ResnetBlock2d(dim_out, self.groups, self.masked_norm, cdt)(h, m, t_emb)
            h = Rezero(LinearAttention2d(dtype=cdt))(h)
            hiddens.append(h)
            if not is_last:
                h = Downsample2d(dim_out, cdt)(h * m)
            masks.append(m[:, :, ::2, :])

        masks = masks[:-1]
        m_mid = masks[-1]
        mid_dim = dims[-1]
        h = ResnetBlock2d(mid_dim, self.groups, self.masked_norm, cdt)(h, m_mid, t_emb)
        h = Rezero(LinearAttention2d(dtype=cdt))(h)
        h = ResnetBlock2d(mid_dim, self.groups, self.masked_norm, cdt)(h, m_mid, t_emb)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            m = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock2d(dim_in, self.groups, self.masked_norm, cdt)(h, m, t_emb)
            h = ResnetBlock2d(dim_in, self.groups, self.masked_norm, cdt)(h, m, t_emb)
            h = Rezero(LinearAttention2d(dtype=cdt))(h)
            h = ConvTranspose2dTorch(dim_in, dim_in, 4, 2, 1, dtype=cdt)(h * m)

        h = Block2d(self.dim, self.groups, self.masked_norm, cdt)(h, mask_img)
        out = nn.Dense(1, name="Conv_0", dtype=cdt)(h * mask_img)  # (B, F, T, 1)
        out = out[..., 0] * mask_img[..., 0]  # (B, F, T)
        return jnp.transpose(out, (0, 2, 1)).astype(in_dtype)  # (B, T, F)
