"""Batched UTMOS scoring over wav directories.

Equivalent of `/root/reference/UTMOS-demo/predict.py` + `score.py`: glob
`*.wav`, resample to 16 kHz, batch with repeat-padding (predict.py:38-51),
score (frame-mean * 2 + 3, domain 0 / judge 288), append per-file CSV rows.

TPU-first: clips are bucketed to a few static lengths and scored in one
jitted program per bucket — dataset-scale scoring without per-clip
recompiles.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.audio.io import load_wav
from arttts_tpu.models.utmos import UTMOSPredictor

SAMPLE_BUCKETS = (16000, 32000, 64000, 96000, 160000, 320000)  # 1s..20s @16k


def _bucket(n: int) -> int:
    for b in SAMPLE_BUCKETS:
        if n <= b:
            return b
    return n


def repeat_pad(wav: np.ndarray, target: int) -> np.ndarray:
    """Tile the clip until it reaches `target` samples (predict.py:38-51
    pads batches by repeating the waveform, not with zeros)."""
    if len(wav) >= target:
        return wav[:target]
    reps = int(np.ceil(target / len(wav)))
    return np.tile(wav, reps)[:target]


class UTMOSScorer:
    def __init__(self, model: Optional[UTMOSPredictor] = None, variables=None):
        self.model = model or UTMOSPredictor()
        self.variables = variables
        self._score_jit = jax.jit(
            lambda v, w: self.model.score(v, w)
        )

    @classmethod
    def from_lightning_checkpoint(cls, ckpt_path: str) -> "UTMOSScorer":
        import torch

        from arttts_tpu.utils.torch_convert_utmos import convert_utmos

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        params = convert_utmos(sd)
        return cls(UTMOSPredictor(), {"params": params})

    def score_batch(self, wavs: Sequence[np.ndarray]) -> np.ndarray:
        """Score clips of identical sample counts in one device call."""
        batch = jnp.asarray(np.stack(wavs).astype(np.float32))
        return np.asarray(self._score_jit(self.variables, batch))

    def score_directory(
        self,
        wav_dir: str,
        out_csv: Optional[str] = None,
        batch_size: int = 32,
        input_sr: int = 16000,
    ) -> Dict[str, float]:
        """Glob `*.wav`, score in static-length buckets, optionally append a
        `filename,score` CSV (predict.py:84-89)."""
        paths = sorted(Path(wav_dir).glob("*.wav"))
        loaded = []
        for p in paths:
            wav, _ = load_wav(p, target_sr=16000)
            loaded.append((p.name, wav))
        # group by bucket
        by_bucket: Dict[int, List] = {}
        for name, wav in loaded:
            by_bucket.setdefault(_bucket(len(wav)), []).append((name, wav))
        results: Dict[str, float] = {}
        for bucket, entries in sorted(by_bucket.items()):
            for i in range(0, len(entries), batch_size):
                chunk = entries[i : i + batch_size]
                wavs = [repeat_pad(w, bucket) for _, w in chunk]
                scores = self.score_batch(wavs)
                for (name, _), s in zip(chunk, scores):
                    results[name] = float(s)
        if out_csv:
            with open(out_csv, "a", newline="") as f:
                writer = csv.writer(f)
                for name in sorted(results):
                    writer.writerow([name, results[name]])
        return results
