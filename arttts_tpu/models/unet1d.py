"""1D (time-conv + cross-channel attention) diffusion estimators.

Equivalent of `Diffusion1D` / `Diffusion1DPreblock` estimators
(`/root/reference/src/model/diffusion_1D.py:52-152,207-…`,
`diffusion_1D_preblock.py:69-84,255-320`): the U-Net skeleton is identical to
the 2D variant, but each `Block` uses a `(1, 3)` time-only convolution followed
by `ArtChannelsAttention` — full softmax attention *across the articulatory
feature axis* per frame — before GroupNorm+Mish. The preblock variant
additionally applies one wide `(1, 9)` block (no GroupNorm) before the downs.

Layout NHWC: `(B, n_feats, T, C)`, mask `(B, 1, T, 1)`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from arttts_tpu.models.convs import ConvTranspose2dTorch
from arttts_tpu.models.unet2d import (
    Downsample2d,
    LinearAttention2d,
    Rezero,
    SinusoidalPosEmb,
    mish,
)


class ArtChannelsAttention(nn.Module):
    """Softmax attention across the n_feats (height) axis per frame
    (diffusion_1D.py:105-152)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, F, T, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 3), padding=((0, 0), (1, 1)), use_bias=False)(x)
        # (B, F, T, 3*heads*d) -> (3, B, heads, T, F, d)
        qkv = qkv.reshape(B, F, T, 3, self.heads, self.dim_head)
        qkv = jnp.transpose(qkv, (3, 0, 4, 2, 1, 5))
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, T, F, d)
        scores = jnp.einsum("bhtnd,bhtmd->bhtnm", q, k) / (self.dim_head**0.5)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhtnm,bhtmd->bhtnd", attn, v)  # (B, h, T, F, d)
        out = jnp.transpose(out, (0, 3, 2, 1, 4)).reshape(B, F, T, hidden)
        return nn.Dense(self.dim, name="Conv_1")(out)


class Block1d(nn.Module):
    """(1,3) conv -> channel attention -> GroupNorm -> Mish
    (diffusion_1D.py:52-66)."""

    dim_out: int
    groups: int = 8
    masked_norm: bool = False

    @nn.compact
    def __call__(self, x, mask):
        from arttts_tpu.models.unet2d import MaskedGroupNorm

        h = nn.Conv(self.dim_out, (1, 3), padding=((0, 0), (1, 1)))(x * mask)
        h = ArtChannelsAttention(self.dim_out)(h)
        if self.masked_norm:
            h = MaskedGroupNorm(num_groups=self.groups, name="GroupNorm_0")(h, mask)
        else:
            h = nn.GroupNorm(num_groups=self.groups)(h)
        return mish(h) * mask


class PreBlock(nn.Module):
    """(1,9) conv -> channel attention -> Mish, no GroupNorm
    (diffusion_1D_preblock.py:69-84)."""

    dim_out: int
    kernel: int = 9

    @nn.compact
    def __call__(self, x, mask):
        pad = self.kernel // 2
        h = nn.Conv(self.dim_out, (1, self.kernel), padding=((0, 0), (pad, pad)))(
            x * mask
        )
        h = ArtChannelsAttention(self.dim_out)(h)
        return mish(h) * mask


class ResnetBlock1d(nn.Module):
    dim_out: int
    groups: int = 8
    masked_norm: bool = False

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = Block1d(self.dim_out, self.groups, self.masked_norm)(x, mask)
        t = nn.Dense(self.dim_out)(mish(time_emb))
        h = h + t[:, None, None, :]
        h = Block1d(self.dim_out, self.groups, self.masked_norm)(h, mask)
        if x.shape[-1] != self.dim_out:
            res = nn.Dense(self.dim_out, name="Conv_0")(x * mask)
        else:
            res = x * mask
        return h + res


class GradLogPEstimator1d(nn.Module):
    """U-Net with 1D blocks; same skeleton as GradLogPEstimator2d."""

    dim: int
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    groups: int = 8
    n_spks: int = 1
    spk_emb_dim: int = 64
    n_feats: int = 16
    pe_scale: int = 1000
    masked_norm: bool = False

    @nn.compact
    def __call__(self, x, mask, mu, t, spk: Optional[jnp.ndarray] = None):
        """x, mu: (B, T, n_feats); mask: (B, T, 1); t: (B,)."""
        t_emb = SinusoidalPosEmb(self.dim)(t, scale=self.pe_scale)
        t_emb = nn.Dense(self.dim * 4)(t_emb)
        t_emb = nn.Dense(self.dim)(mish(t_emb))

        planes = [jnp.transpose(mu, (0, 2, 1)), jnp.transpose(x, (0, 2, 1))]
        if self.n_spks > 1:
            assert spk is not None
            s = nn.Dense(self.spk_emb_dim * 4)(spk)
            s = nn.Dense(self.n_feats)(mish(s))
            planes.append(jnp.broadcast_to(s[:, :, None], planes[0].shape))
        h = jnp.stack(planes, axis=-1)  # (B, F, T, 2 or 3)
        mask_img = mask[:, None, :, :]

        dims = [h.shape[-1]] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        hiddens = []
        masks = [mask_img]
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            m = masks[-1]
            h = ResnetBlock1d(dim_out, self.groups, self.masked_norm)(h, m, t_emb)
            h = ResnetBlock1d(dim_out, self.groups, self.masked_norm)(h, m, t_emb)
            h = Rezero(LinearAttention2d())(h)
            hiddens.append(h)
            if not is_last:
                h = Downsample2d(dim_out)(h * m)
            masks.append(m[:, :, ::2, :])

        masks = masks[:-1]
        m_mid = masks[-1]
        mid_dim = dims[-1]
        h = ResnetBlock1d(mid_dim, self.groups, self.masked_norm)(h, m_mid, t_emb)
        h = Rezero(LinearAttention2d())(h)
        h = ResnetBlock1d(mid_dim, self.groups, self.masked_norm)(h, m_mid, t_emb)

        for dim_in, dim_out in reversed(in_out[1:]):
            m = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock1d(dim_in, self.groups, self.masked_norm)(h, m, t_emb)
            h = ResnetBlock1d(dim_in, self.groups, self.masked_norm)(h, m, t_emb)
            h = Rezero(LinearAttention2d())(h)
            h = ConvTranspose2dTorch(dim_in, dim_in, 4, 2, 1)(h * m)

        h = Block1d(self.dim, self.groups, self.masked_norm)(h, mask_img)
        out = nn.Dense(1, name="Conv_0")(h * mask_img)
        out = out[..., 0] * mask_img[..., 0]
        return jnp.transpose(out, (0, 2, 1))
