"""Top-level acoustic models (flax.linen).

`GradTTSModel` unifies the reference's single-speaker family —
`ArtTTS` / `GradTTS` / `AttentionTTS` / `AttentionTTSPreblock`
(`/root/reference/src/model/tts.py:28,319,604,895`) — and the multi-speaker
`GradTTArtic` (`model_ms/tts.py:25-262`): the encoder kind, decoder kind, and
speaker-conditioning path are all selected by `ModelConfig`.

The module only *holds parameters and submodule forwards* (encode,
estimate_noise, speaker embedding); training losses are pure functions in
`arttts_tpu/train/losses.py` and sampling is a pure `lax.fori_loop` in
`arttts_tpu/infer/sampler.py` — idiomatic functional JAX instead of the
reference's stateful `compute_loss`/`forward` methods.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from arttts_tpu.core.config import ModelConfig
from arttts_tpu.models.encoder import Encoder
from arttts_tpu.models.unet2d import GradLogPEstimator2d


class SpeakerEncodingLayer(nn.Module):
    """1024-d SSL speaker pre-embedding -> 64-d embedding
    (model_ms/spk_encoder.py:13-24)."""

    hidden_dim: int = 1024
    out_dim: int = 64

    @nn.compact
    def __call__(self, spk_ft):
        h = nn.Dense(self.hidden_dim)(spk_ft)
        h = nn.gelu(h, approximate=False)  # torch GELU is exact erf
        return nn.Dense(self.out_dim)(h)


class GradTTSModel(nn.Module):
    """Encoder + diffusion score estimator (+ speaker embedding)."""

    config: ModelConfig

    def setup(self):
        c = self.config
        self.encoder = Encoder(
            config=c.encoder,
            n_feats=c.n_feats,
            n_spks=c.n_spks,
            spk_emb_dim=c.spk_emb_dim,
        )
        d = c.decoder
        if d.kind in ("unet2d", "unet1d_preblock"):
            # NOTE: the reference's Diffusion1DPreblock keeps the *2D* conv
            # U-Net body and only prepends a (1,9)+channel-attention PreBlock
            # (diffusion_1D_preblock.py:85-99,255-257).
            self.estimator = GradLogPEstimator2d(
                dim=d.dim,
                dim_mults=d.dim_mults,
                groups=d.groups,
                n_spks=c.n_spks,
                spk_emb_dim=c.spk_emb_dim,
                n_feats=c.n_feats,
                pe_scale=d.pe_scale,
                masked_norm=d.masked_norm,
                use_preblock=(d.kind == "unet1d_preblock"),
                preblock_kernel=d.preblock_kernel,
                compute_dtype=d.compute_dtype,
            )
        elif d.kind == "unet1d":
            from arttts_tpu.models.unet1d import GradLogPEstimator1d

            self.estimator = GradLogPEstimator1d(
                dim=d.dim,
                dim_mults=d.dim_mults,
                groups=d.groups,
                n_spks=c.n_spks,
                spk_emb_dim=c.spk_emb_dim,
                n_feats=c.n_feats,
                pe_scale=d.pe_scale,
                masked_norm=d.masked_norm,
            )
        else:
            raise ValueError(f"unknown decoder kind {d.kind!r}")

        if c.name == "grad_ttartic":
            # multi-speaker articulatory model: SSL pre-embedding path
            self.spk_encoder = SpeakerEncodingLayer(
                hidden_dim=c.spk_preemb_dim, out_dim=c.spk_emb_dim
            )
        elif c.n_spks > 1:
            self.spk_table = nn.Embed(c.n_spks, c.spk_emb_dim)

    # --- speaker conditioning ------------------------------------------------
    def embed_speaker(self, spk) -> Optional[jnp.ndarray]:
        """spk: int ids (B,) for the embedding-table path, or float
        pre-embeddings (B, spk_preemb_dim) for grad_ttartic; None otherwise."""
        if spk is None:
            return None
        c = self.config
        if c.name == "grad_ttartic":
            return self.spk_encoder(spk)
        if c.n_spks > 1:
            return self.spk_table(spk)
        return None

    # --- forwards ------------------------------------------------------------
    def encode(self, x, x_lengths, spk=None, deterministic: bool = True):
        """Returns (mu_x, logw, x_mask); spk is a *raw* speaker input."""
        spk_emb = self.embed_speaker(spk)
        return self.encoder(x, x_lengths, spk_emb, deterministic=deterministic)

    def estimate_noise(self, xt, mask, mu, t, spk=None):
        """Score-network forward; spk is a raw speaker input."""
        spk_emb = self.embed_speaker(spk)
        return self.estimator(xt, mask, mu, t, spk_emb)

    def __call__(self, x, x_lengths, y, y_mask, t, spk=None):
        """Init-only convenience: touches every submodule once."""
        mu_x, logw, x_mask = self.encode(x, x_lengths, spk)
        # project mu_x through a dummy alignment so shapes line up
        noise = self.estimate_noise(
            y, y_mask, jnp.zeros_like(y), t, spk
        )
        return mu_x, logw, x_mask, noise


def build_model(config: ModelConfig) -> GradTTSModel:
    return GradTTSModel(config=config)
