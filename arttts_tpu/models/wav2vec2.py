"""wav2vec 2.0 encoder (flax) for UTMOS MOS scoring.

The reference's UTMOS consumes a fairseq wav2vec2-small
(`/root/reference/UTMOS-demo/model.py:7-48`, `features_only` forward). This
is a native flax implementation of the same architecture (base config,
post-layer-norm variant):

  raw wav -> 7-layer conv feature extractor (512 ch; GroupNorm on layer 0,
  GELU, no bias) -> LayerNorm -> Linear 512->768 -> +grouped positional conv
  (k=128, groups=16, weight-normed) -> LayerNorm -> 12 post-LN transformer
  blocks (12 heads, FFN 3072).

Weight converters for both fairseq and HuggingFace naming live in
`arttts_tpu/utils/torch_convert_utmos.py`; correctness is golden-tested
against `transformers.Wav2Vec2Model` on a small config.

TPU notes: the conv stack and attention are all MXU ops; a whole batch of
10 s clips runs in one jitted program for dataset-scale scoring
(BASELINE.md config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5


class FeatureExtractor(nn.Module):
    """Strided conv stack; GroupNorm(dim, dim) on the first layer only
    (fairseq "default"/HF "group" mode)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav):
        # wav: (B, T) -> (B, frames, C)
        x = wav[:, :, None]
        for i, (dim, k, stride) in enumerate(self.config.conv_layers):
            x = nn.Conv(
                dim,
                (k,),
                strides=(stride,),
                padding="VALID",
                use_bias=False,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=self.config.layer_norm_eps, name="group_norm"
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv relative positional embedding with weight normalization
    folded at conversion time (we store the plain kernel)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        c = self.config
        k = c.pos_conv_kernel
        pad = k // 2
        h = nn.Conv(
            c.hidden_dim,
            (k,),
            padding=((pad, pad),),
            feature_group_count=c.pos_conv_groups,
            name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1]  # even kernel: drop the trailing frame (fairseq)
        return nn.gelu(h, approximate=False)


class TransformerLayer(nn.Module):
    """Post-LN transformer block (wav2vec2 base, layer_norm_first=False)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jnp.ndarray] = None):
        c = self.config
        residual = x
        attn = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads,
            qkv_features=c.hidden_dim,
            out_features=c.hidden_dim,
            name="attention",
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(residual + attn)
        residual = x
        h = nn.Dense(c.ffn_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_dim, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(
            residual + h
        )


class Wav2Vec2Encoder(nn.Module):
    config: Wav2Vec2Config = Wav2Vec2Config()

    @nn.compact
    def __call__(self, wav):
        """wav: (B, num_samples) 16 kHz in [-1, 1] -> (B, frames, hidden)."""
        c = self.config
        feats = FeatureExtractor(c, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="feature_norm")(feats)
        x = nn.Dense(c.hidden_dim, name="feature_projection")(x)
        x = x + PositionalConvEmbedding(c, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_norm")(x)
        for i in range(c.num_layers):
            x = TransformerLayer(c, name=f"layer_{i}")(x)
        return x

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for _, k, s in self.config.conv_layers:
            n = (n - k) // s + 1
        return n
