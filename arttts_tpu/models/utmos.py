"""UTMOS MOS predictor (flax).

Equivalent of the vendored UTMOS strong learner
(`/root/reference/UTMOS-demo/model.py`, `lightning_module.py:17-41`,
`score.py:8-61`): wav2vec2-small SSL features + DomainEmbedding(3, 128) +
judge-conditioned BiLSTM (`LDConditioner`, 3000 judges, judge_dim 128,
hidden 512 bidirectional) + MLP `Projection` (1024 -> 2048 ReLU -> 1);
score = frame-mean * 2 + 3 with fixed inputs domain=0, judge=288.

The whole scorer jits into one program, so dataset-scale batched scoring
(BASELINE.md config 5; `UTMOS-demo/predict.sh` batch 32) runs entirely
on-device.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from arttts_tpu.models.lstm import BiLSTM
from arttts_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


class UTMOSPredictor(nn.Module):
    ssl_config: Wav2Vec2Config = Wav2Vec2Config()
    n_domains: int = 3
    domain_dim: int = 128
    num_judges: int = 3000
    judge_dim: int = 128
    lstm_hidden: int = 512
    projection_hidden: int = 2048

    @nn.compact
    def __call__(self, wav, domains, judge_ids, deterministic: bool = True):
        """wav (B, num_samples) 16 kHz; domains/judge_ids (B,) int ->
        per-frame scores (B, frames, 1)."""
        ssl = Wav2Vec2Encoder(self.ssl_config, name="ssl")(wav)  # (B, T, 768)
        T = ssl.shape[1]

        dom = nn.Embed(self.n_domains, self.domain_dim, name="domain_embedding")(
            domains
        )
        judge = nn.Embed(self.num_judges, self.judge_dim, name="judge_embedding")(
            judge_ids
        )
        feats = jnp.concatenate(
            [
                ssl,
                jnp.broadcast_to(dom[:, None, :], (ssl.shape[0], T, self.domain_dim)),
                jnp.broadcast_to(
                    judge[:, None, :], (ssl.shape[0], T, self.judge_dim)
                ),
            ],
            axis=-1,
        )
        h = BiLSTM(
            input_size=feats.shape[-1], hidden_size=self.lstm_hidden, name="decoder_rnn"
        )(feats)
        h = nn.Dense(self.projection_hidden, name="proj_0")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.3, deterministic=deterministic)(h)
        return nn.Dense(1, name="proj_1")(h)  # (B, T, 1)

    def score(self, variables, wav):
        """Batched MOS scores (B,) = frame-mean * 2 + 3 with the fixed
        domain 0 / judge 288 protocol (score.py:53-61)."""
        B = wav.shape[0]
        out = self.apply(
            variables,
            wav,
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), 288, jnp.int32),
        )
        return out.mean(axis=1)[:, 0] * 2.0 + 3.0
