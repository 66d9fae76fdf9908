"""Real-audio segment-crop dataset for HiFi-GAN training.

Parity target: the reference's `MelDataset`
(`/root/reference/src/hifi-gan/meldataset.py:115-246`) — random fixed-size
audio segments paired with log-mel inputs, peak normalization, short-clip
padding, and a fine-tuning mode that crops frame-aligned segments from
precomputed (acoustic-model-output) mels.

TPU-first restructure: the dataset is a thin host-side numpy layer that
yields STATIC-SHAPE `(B, segment)` wav batches; the input mel for the whole
batch is computed in one jitted XLA call (`MelSpectrogram`), not per-item on
a CPU worker. Segments are a fixed multiple of `hop_length`, so every batch
compiles once. Loaded wavs are kept in a small LRU cache (the reference's
`n_cache_reuse` counter equivalent).
"""

from __future__ import annotations

import dataclasses
import os
from collections import OrderedDict
from typing import Iterator, Optional, Sequence

import jax
import numpy as np

from arttts_tpu.audio.mel import MelConfig, MelSpectrogram

MAX_WAV_VALUE = 32768.0


@dataclasses.dataclass(frozen=True)
class VocoderDataConfig:
    """Segment/crop policy (ref hifi-gan/config_v1.json + meldataset.py)."""

    segment_size: int = 8192  # samples; must be a multiple of hop_length
    sample_rate: int = 22050
    normalize_peak: bool = True  # librosa-style |max| normalize * 0.95
    fine_tuning: bool = False
    base_mels_dir: Optional[str] = None  # fine-tuning: acoustic-output mels
    cache_items: int = 8  # LRU of decoded wavs


def load_wav(path: str, expected_rate: Optional[int] = None) -> np.ndarray:
    """scipy.io.wavfile reader -> float32 in [-1, 1] (meldataset.py:160-170;
    soundfile is not in this environment)."""
    from scipy.io import wavfile

    rate, data = wavfile.read(path)
    if expected_rate is not None and rate != expected_rate:
        raise ValueError(f"{path}: rate {rate} != expected {expected_rate}")
    if data.dtype == np.int16:
        return data.astype(np.float32) / MAX_WAV_VALUE
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    return data.astype(np.float32)


class VocoderSegmentDataset:
    """Random segment crops of real audio, with batched on-device mel.

    `sample_batch` returns `{"wav": (B, S, 1), "mel": (B, S/hop, n_mels)}` —
    exactly the `VocoderGAN.make_train_step` batch contract. In fine-tuning
    mode the input mel comes from `base_mels_dir/<stem>.npy` (frame-major
    `(T, n_mels)`) and the wav crop is frame-aligned to it
    (meldataset.py:199-230); otherwise it is recomputed from the cropped wav.
    """

    def __init__(
        self,
        wav_paths: Sequence[str],
        config: VocoderDataConfig = VocoderDataConfig(),
        mel_config: MelConfig = MelConfig(),
    ):
        if config.segment_size % mel_config.hop_length:
            raise ValueError("segment_size must be a multiple of hop_length")
        self.paths = list(wav_paths)
        self.config = config
        self.mel_config = mel_config
        self.mel = MelSpectrogram(mel_config)
        self._mel_batch = jax.jit(self.mel.__call__)
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self.seg_frames = config.segment_size // mel_config.hop_length

    def __len__(self) -> int:
        return len(self.paths)

    # -- host-side IO -------------------------------------------------------
    def _audio(self, path: str) -> np.ndarray:
        cached = self._cache.get(path)
        if cached is not None:
            self._cache.move_to_end(path)
            return cached
        wav = load_wav(path, self.config.sample_rate)
        if self.config.normalize_peak and not self.config.fine_tuning:
            peak = np.abs(wav).max()
            if peak > 0:
                wav = wav / peak * 0.95
        self._cache[path] = wav
        while len(self._cache) > self.config.cache_items:
            self._cache.popitem(last=False)
        return wav

    def _base_mel(self, path: str) -> np.ndarray:
        stem = os.path.splitext(os.path.basename(path))[0]
        mel = np.load(os.path.join(self.config.base_mels_dir, stem + ".npy"))
        if mel.ndim == 3:
            mel = mel[0]
        if mel.shape[0] == self.mel_config.n_mels and mel.shape[1] != self.mel_config.n_mels:
            mel = mel.T  # accept channel-major dumps
        return mel.astype(np.float32)  # (T, n_mels)

    def _crop(self, idx: int, rng: np.random.Generator):
        """One (wav_segment, mel_or_None) crop with short-clip zero pad."""
        cfg = self.config
        hop = self.mel_config.hop_length
        wav = self._audio(self.paths[idx])
        seg = cfg.segment_size
        if not cfg.fine_tuning:
            if len(wav) >= seg:
                start = int(rng.integers(0, len(wav) - seg + 1))
                return wav[start:start + seg], None
            return np.pad(wav, (0, seg - len(wav))), None
        mel = self._base_mel(self.paths[idx])
        if len(wav) >= seg and mel.shape[0] > self.seg_frames:
            m0 = int(rng.integers(0, mel.shape[0] - self.seg_frames))
            mel_c = mel[m0:m0 + self.seg_frames]
            wav_c = wav[m0 * hop:(m0 + self.seg_frames) * hop]
            if len(wav_c) < seg:  # mel longer than audio tail
                wav_c = np.pad(wav_c, (0, seg - len(wav_c)))
            return wav_c, mel_c
        mel_c = np.zeros((self.seg_frames, mel.shape[1]), np.float32)
        mel_c[: min(self.seg_frames, mel.shape[0])] = mel[: self.seg_frames]
        wav_c = np.pad(wav[:seg], (0, max(0, seg - len(wav))))
        return wav_c, mel_c

    # -- batch assembly ------------------------------------------------------
    def sample_batch(self, batch_size: int, rng: np.random.Generator) -> dict:
        idx = rng.integers(0, len(self.paths), size=batch_size)
        return self._assemble(idx, rng)

    def _assemble(self, indices, rng) -> dict:
        wavs, mels = [], []
        for i in indices:
            w, m = self._crop(int(i), rng)
            wavs.append(w)
            mels.append(m)
        wav = np.stack(wavs).astype(np.float32)  # (B, S)
        if self.config.fine_tuning:
            mel = np.stack(mels)
        else:
            mel = np.asarray(self._mel_batch(wav))  # one jitted batch call
        return {"wav": wav[:, :, None], "mel": mel}

    def batches(
        self, batch_size: int, seed: int = 1234, drop_last: bool = True
    ) -> Iterator[dict]:
        """One epoch of shuffled batches (ref shuffles once with seed 1234)."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.paths))
        stop = len(order) - (len(order) % batch_size) if drop_last else len(order)
        for k in range(0, stop, batch_size):
            yield self._assemble(order[k:k + batch_size], rng)
