"""Text / IPA-trait encoders with duration prediction.

Equivalent of `IpaTraitEncoder` / `TextEncoder`
(`/root/reference/src/model/text_encoder.py:357-513`): masked prenet ->
optional speaker concat -> windowed rel-pos transformer -> `proj_m` (mu) and a
gradient-stopped `DurationPredictor` (`proj_w` operates on detached features,
text_encoder.py:433).

Layout `(B, T, C)`; returns `(mu, logw, x_mask)` with mask `(B, T, 1)`.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from arttts_tpu.core.config import EncoderConfig
from arttts_tpu.models.layers import (
    ConvReluNorm,
    DurationPredictor,
    TransformerEncoder,
)
from arttts_tpu.ops.shape import sequence_mask


class Encoder(nn.Module):
    """Unified encoder; `config.kind` selects the input embedding:

    - "ipa_trait": 25-dim ternary trait vectors in, prenet keeps the input dim
      to preserve the residual connection (text_encoder.py:390-399);
    - "text": learned symbol embedding scaled by sqrt(n_channels)
      (text_encoder.py:468-506).
    """

    config: EncoderConfig
    n_feats: int
    n_spks: int = 1
    spk_emb_dim: int = 64

    @nn.compact
    def __call__(
        self,
        x,
        x_lengths,
        spk: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.config
        if c.kind == "text":
            # x: (B, T) int32 symbol ids
            emb = nn.Embed(
                c.n_vocab,
                c.n_channels,
                embedding_init=nn.initializers.normal(c.n_channels**-0.5),
            )(x)
            h = emb * math.sqrt(c.n_channels)  # (B, T, C)
            width = c.n_channels
        else:
            # x: (B, T, n_input_feats) float ternary traits
            h = x
            width = c.n_input_feats

        x_mask = sequence_mask(x_lengths, h.shape[1]).astype(h.dtype)[:, :, None]

        h = ConvReluNorm(
            hidden_channels=c.n_channels,
            out_channels=width,
            kernel_size=c.prenet_kernel,
            n_layers=c.prenet_layers,
            dropout=c.prenet_dropout,
        )(h, x_mask, deterministic=deterministic)

        if self.n_spks > 1:
            assert spk is not None, "multi-speaker encoder needs spk embeddings"
            spk_tiled = jnp.broadcast_to(
                spk[:, None, :], (h.shape[0], h.shape[1], spk.shape[-1])
            )
            h = jnp.concatenate([h, spk_tiled], axis=-1)
            width = width + spk.shape[-1]

        h = TransformerEncoder(
            hidden_channels=width,
            filter_channels=c.filter_channels,
            n_heads=c.n_heads,
            n_layers=c.n_layers,
            kernel_size=c.kernel_size,
            dropout=c.dropout,
            window_size=c.window_size,
        )(h, x_mask, deterministic=deterministic)

        mu = nn.Conv(self.n_feats, (1,), name="proj_m")(h) * x_mask
        if c.use_duration_predictor:
            # duration predictor sees gradient-stopped features
            # (text_encoder.py:433)
            h_dp = jax.lax.stop_gradient(h)
            logw = DurationPredictor(
                filter_channels=c.filter_channels_dp,
                kernel_size=c.kernel_size,
                dropout=c.dropout,
                name="proj_w",
            )(h_dp, x_mask, deterministic=deterministic)
        else:
            # aligned-input models (model_ms phnm_encoder.py has no proj_w)
            logw = jnp.zeros_like(x_mask)
        return mu, logw, x_mask
