"""Encoder building blocks (flax.linen), feature-last `(B, T, C)` layout.

TPU-native re-design of the glow-tts-lineage blocks at
`/root/reference/src/model/text_encoder.py`: channel LayerNorm (eps 1e-4),
masked ConvReluNorm prenet with zero-init residual projection, duration
predictor, windowed relative-position multi-head attention (window 4,
shared-head relative embeddings, additive -1e4 masking), and conv FFN.

All sequence ops are static-shape; masks are `(B, T, 1)` floats multiplied
through, exactly where the reference multiplies them, so padded positions
never contaminate unpadded ones (needed for bucketed-batch parity).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the feature axis with the reference's eps=1e-4
    (text_encoder.py:11-29)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-4, use_bias=True, use_scale=True)(x)


class ConvReluNorm(nn.Module):
    """Masked conv prenet with residual zero-init projection
    (text_encoder.py:32-82)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x_org = x
        h = x
        for _ in range(self.n_layers):
            h = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")(
                h * x_mask
            )
            h = ChannelLayerNorm()(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        # zero-init projection: the prenet starts as the identity
        proj = nn.Conv(
            self.out_channels,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        return (x_org + proj) * x_mask


class DurationPredictor(nn.Module):
    """Two masked convs + LN + dropout, 1-dim output (text_encoder.py:85-113)."""

    filter_channels: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME")(
            x * x_mask
        )
        h = nn.relu(h)
        h = ChannelLayerNorm()(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME")(
            h * x_mask
        )
        h = nn.relu(h)
        h = ChannelLayerNorm()(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(1, (1,))(h * x_mask)
        return h * x_mask


def _rel_to_abs(x):
    """(B, H, L, 2L-1) relative-keyed logits -> (B, H, L, L) absolute.

    Standard music-transformer skew, as in text_encoder.py:236-248.
    """
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x):
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative-keyed."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


class RelPositionMultiHeadAttention(nn.Module):
    """Self-attention with windowed relative-position bias
    (text_encoder.py:116-265; window_size=4, heads_share=True).

    Out-of-window relative offsets contribute zero (the reference zero-pads
    the relative embedding table), making this effectively local attention.
    """

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        B, L, _ = x.shape
        H = self.n_heads
        D = self.channels // H
        xavier = nn.initializers.xavier_uniform()
        q = nn.Dense(self.channels, kernel_init=xavier)(x)
        k = nn.Dense(self.channels, kernel_init=xavier)(x)
        v = nn.Dense(self.channels, kernel_init=xavier)(x)

        q = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)  # (B, H, L, D)
        k = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / math.sqrt(D)

        if self.window_size is not None:
            w = self.window_size
            rel_stddev = D**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (1, 2 * w + 1, D),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (1, 2 * w + 1, D),
            )
            rel_k = self._expand_rel(emb_rel_k, L)  # (1, 2L-1, D)
            rel_logits = jnp.einsum("bhld,gmd->bhlm", q, rel_k)  # (B,H,L,2L-1)
            scores = scores + _rel_to_abs(rel_logits) / math.sqrt(D)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.dropout, deterministic=deterministic)(p_attn)
        out = jnp.einsum("bhlm,bhmd->bhld", p_attn, v)

        if self.window_size is not None:
            rel_weights = _abs_to_rel(p_attn)  # (B, H, L, 2L-1)
            rel_v = self._expand_rel(emb_rel_v, L)  # (1, 2L-1, D)
            out = out + jnp.einsum("bhlm,gmd->bhld", rel_weights, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.channels)
        return nn.Dense(self.out_channels, kernel_init=xavier)(out)

    def _expand_rel(self, emb, length):
        """Center-crop/zero-pad the (2w+1) table to (2*length-1) entries."""
        w = self.window_size
        pad = max(length - (w + 1), 0)
        start = max((w + 1) - length, 0)
        padded = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
        return lax.dynamic_slice_in_dim(padded, start, 2 * length - 1, axis=1)


class FFN(nn.Module):
    """Masked two-conv feed-forward (text_encoder.py:268-292)."""

    filter_channels: int
    out_channels: int
    kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME")(
            x * x_mask
        )
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME")(h * x_mask)
        return h * x_mask


class TransformerEncoder(nn.Module):
    """Pre-LN-free transformer stack, post-norm like the reference
    (text_encoder.py:295-354)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 3
    dropout: float = 0.0
    window_size: Optional[int] = 4

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # attn_mask: (B, 1, L, L)
        attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]).astype(
            x.dtype
        )
        for _ in range(self.n_layers):
            x = x * x_mask
            y = RelPositionMultiHeadAttention(
                channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                n_heads=self.n_heads,
                window_size=self.window_size,
                dropout=self.dropout,
            )(x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
            x = ChannelLayerNorm()(x + y)
            y = FFN(
                filter_channels=self.filter_channels,
                out_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
            x = ChannelLayerNorm()(x + y)
        return x * x_mask
