"""Framework-native SPARC articulatory encoder (acoustic-to-articulatory
inversion + source features + speaker pre-embedding).

The reference delegates this entirely to the external `sparc` package
(`/root/reference/src/encode_audio_voxcom.py:1,66-88`, `data.py:136-161`):
`coder.encode(wav, concat=True)` returns `features` (T, 14) = 12 EMA
channels + pitch + loudness at 50 Hz plus a 1024-d speaker pre-embedding.
This module implements the same contract natively so the offline encoding
jobs and the `quanti_art` re-encoding loop (`quanti_art_voxcom.py:118-160`)
can run self-contained on TPU:

  * EMA channels: linear probe over an intermediate WavLM-Large layer
    (SPARC's inversion design, Cho et al. Interspeech 2024) — WavLM runs
    natively (`models/wavlm.py`, golden vs `transformers`), stopping at the
    tap layer (9 of 24: ~40% of the stack).
  * pitch / loudness: batched YIN + log-RMS (`audio/pitch.py`), frame grids
    aligned to WavLM's 50 Hz conv stride.
  * speaker pre-embedding: masked temporal mean of the tapped features
    (1024-d, matching the `spk_preemb` shape the ms data layout stores —
    `encode_audio_voxcom.py:66-70`).

Weights: the WavLM backbone converts from the public HF checkpoint
(`utils/torch_convert_wavlm.py`); the 12-channel probe is a single
(1024, 12) matrix loadable from the sparc checkpoint (see
`load_probe_npz`). Random-weight flows are supported everywhere so the
pipeline is testable without external checkpoints; numerical parity with
the external coder then reduces to the probe + backbone weights used.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.audio.pitch import PitchConfig, frame_loudness, track_pitch
from arttts_tpu.models.wavlm import WavLMConfig, WavLMEncoder


@dataclasses.dataclass(frozen=True)
class SparcEncoderConfig:
    wavlm: WavLMConfig = WavLMConfig.large()
    tap_layer: int = 9
    n_ema: int = 12
    pitch: PitchConfig = PitchConfig()

    @property
    def frame_rate(self) -> int:
        return 50


class SparcEncoder(nn.Module):
    """wav (B, T_samples) -> (features (B, n_frames, 14), spk_preemb (B, 1024)).

    Feature column order matches the `emasrc` contract consumed across the
    reference (`data.py:107-134`, `quanti_art_voxcom.py:140-151`):
    [EMA x 12, pitch, loudness].
    """

    config: SparcEncoderConfig = SparcEncoderConfig()

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        feats = WavLMEncoder(c.wavlm, name="wavlm")(
            wav, frame_mask=frame_mask, tap_layer=c.tap_layer
        )  # (B, N, D)
        ema = nn.Dense(c.n_ema, name="ema_probe")(feats)  # (B, N, 12)

        n = feats.shape[1]
        f0, _ = track_pitch(_align_pad(wav, c), c.pitch)
        loud = frame_loudness(
            _align_pad(wav, c), c.pitch.frame_length, c.pitch.hop
        )
        f0 = _fit_frames(f0, n)[..., None]
        loud = _fit_frames(loud, n)[..., None]

        features = jnp.concatenate([ema, f0, loud], axis=-1)  # (B, N, 14)
        if frame_mask is not None:
            m = frame_mask[:, :n, None].astype(feats.dtype)
            features = features * m
            spk = jnp.sum(feats * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        else:
            spk = jnp.mean(feats, axis=1)
        return features, spk

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for _, k, s in self.config.wavlm.conv_layers:
            n = (n - k) // s + 1
        return n


def _align_pad(wav: jnp.ndarray, c: SparcEncoderConfig) -> jnp.ndarray:
    """Pad so the pitch/loudness frame centers land on WavLM's conv-stride
    grid: WavLM's receptive field is 400 samples at hop 320; the source
    frames use `frame_length` (1024), so pad (1024 - 400) / 2 per side."""
    pad = (c.pitch.frame_length - 400) // 2
    return jnp.pad(wav, ((0, 0), (pad, pad)))


def _fit_frames(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Trim/edge-pad (B, N') to exactly (B, n)."""
    if x.shape[1] >= n:
        return x[:, :n]
    reps = jnp.repeat(x[:, -1:], n - x.shape[1], axis=1)
    return jnp.concatenate([x, reps], axis=1)


def load_probe_npz(path: str) -> dict:
    """Load the (D, 12) EMA probe exported from a sparc checkpoint as an
    npz with arrays `weight` (12, D) or `kernel` (D, 12) and optional
    `bias` (12,). Returns flax `ema_probe` params."""
    data = np.load(path)
    if "kernel" in data:
        kernel = np.asarray(data["kernel"], np.float32)
    else:
        kernel = np.asarray(data["weight"], np.float32).T
    bias = (
        np.asarray(data["bias"], np.float32)
        if "bias" in data.files
        else np.zeros((kernel.shape[1],), np.float32)
    )
    return {"kernel": kernel, "bias": bias}


def build_encoder_params(
    hf_wavlm_state_dict: Optional[dict],
    config: SparcEncoderConfig = SparcEncoderConfig(),
    probe: Optional[dict] = None,
    rng: Optional[jax.Array] = None,
) -> dict:
    """Assemble `SparcEncoder` params from a converted WavLM backbone plus a
    probe; missing pieces fall back to random init (testing / smoke)."""
    from arttts_tpu.utils.torch_convert_wavlm import convert_wavlm

    enc = SparcEncoder(config)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    init = jax.jit(enc.init)(rng, jnp.zeros((1, 16000), jnp.float32))["params"]
    params = jax.tree.map(np.asarray, init)
    if hf_wavlm_state_dict is not None:
        params["wavlm"] = convert_wavlm(hf_wavlm_state_dict, config.wavlm)
    if probe is not None:
        params["ema_probe"] = probe
    return {"params": params}
