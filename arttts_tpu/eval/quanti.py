"""Quantitative evaluation harnesses producing per-sample CSVs.

Equivalents of `/root/reference/src/quanti_art_voxcom.py` (PCC of EMA mean /
pitch / loudness between predicted trajectories and SPARC re-encodings),
`quanti_art_comp.py` (DTW + PCC vs EMA corpora ground truth at 50 Hz) and
`quanti_mel_comp.py` (mel L2/DTW vs ground-truth mels). Each stage consumes
the filesystem artifacts of the previous one (`(29|161, T)` npys) and
appends CSV rows, keeping the reference's stage contract.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from arttts_tpu.eval.metrics import (
    ema_mean_pcc,
    mel_l2,
    normalized_dtw_score,
    pearson_correlation,
)
from arttts_tpu.infer.pipeline import split_acoustic_artifact


def quanti_art(
    pred_dir: str,
    ref_dir: str,
    out_csv: Optional[str] = None,
    use_decoder_rows: bool = True,
) -> Dict[str, Dict[str, float]]:
    """Compare predicted articulatory artifacts against reference SPARC
    feature npys ((T, >=14), e.g. re-encodings of the vocoded audio).

    Per sample: mean EMA PCC (12 ch), pitch PCC (ch 12), loudness PCC
    (ch 13), normalized DTW over the 12 EMA channels.
    """
    results: Dict[str, Dict[str, float]] = {}
    for pred_fp in sorted(Path(pred_dir).glob("*.npy")):
        ref_fp = Path(ref_dir) / pred_fp.name
        if not ref_fp.exists():
            continue
        arr = np.load(pred_fp)
        enc, dec, _ = split_acoustic_artifact(arr, n_feats=14)
        pred = dec if use_decoder_rows else enc  # (T, 14)
        ref = np.load(ref_fp)[:, :14]
        T = min(pred.shape[0], ref.shape[0])
        pred, ref = pred[:T], ref[:T]
        dtw, _, _ = normalized_dtw_score(pred[:, :12], ref[:, :12])
        results[pred_fp.stem] = {
            "ema_pcc": ema_mean_pcc(pred, ref),
            "pitch_pcc": pearson_correlation(pred[:, 12], ref[:, 12]),
            "loudness_pcc": pearson_correlation(pred[:, 13], ref[:, 13]),
            "dtw": dtw,
        }
    if out_csv and results:
        keys = ["ema_pcc", "pitch_pcc", "loudness_pcc", "dtw"]
        new_file = not Path(out_csv).exists()
        with open(out_csv, "a", newline="") as f:
            w = csv.writer(f)
            if new_file:
                w.writerow(["sample_id"] + keys)
            for sid in sorted(results):
                w.writerow([sid] + [results[sid][k] for k in keys])
    return results


def reencode_wavs(
    wav_dir: str,
    out_dir: str,
    variables=None,
    config=None,
) -> int:
    """Self-contained SPARC re-encoding step of the quanti_art protocol
    (`quanti_art_voxcom.py:118-160` re-encodes the vocoded audio with the
    external coder; this uses the framework-native encoder,
    `models/sparc_encoder.py`). Writes `(T, 14)` npys named after the wavs;
    returns the number encoded. `variables=None` uses random weights
    (pipeline smoke only — pass converted WavLM + probe weights for real
    evaluation)."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.audio.io import load_wav
    from arttts_tpu.models.sparc_encoder import (
        SparcEncoder,
        SparcEncoderConfig,
        build_encoder_params,
    )

    config = config or SparcEncoderConfig()
    enc = SparcEncoder(config)
    if variables is None:
        variables = build_encoder_params(None, config)
    variables = jax.tree.map(jnp.asarray, variables)

    @jax.jit
    def run(wav, mask):
        return enc.apply(variables, wav, frame_mask=mask)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    buckets = [32000 * i for i in range(1, 16)]
    n_done = 0
    for wav_fp in sorted(Path(wav_dir).glob("*.wav")):
        wav, _ = load_wav(str(wav_fp), target_sr=config.pitch.sample_rate)
        n = len(wav)
        cap = next((b for b in buckets if n <= b), buckets[-1])
        if n > cap:
            import logging

            logging.getLogger("arttts_tpu.quanti").warning(
                "%s: %d samples exceed the largest bucket (%d); truncating",
                wav_fp, n, cap,
            )
        pad = np.zeros((1, cap), np.float32)
        pad[0, :n] = wav[:cap]
        n_valid = enc.num_frames(min(n, cap))
        n_tot = enc.num_frames(cap)
        mask = (np.arange(n_tot) < n_valid).astype(np.float32)[None]
        feats, _sp = run(jnp.asarray(pad), jnp.asarray(mask))
        np.save(out / f"{wav_fp.stem}.npy", np.asarray(feats)[0, :n_valid])
        n_done += 1
    return n_done


def quanti_mel(
    pred_dir: str,
    ref_mel_dir: str,
    out_csv: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    """Mel artifacts ((161, T)) vs ground-truth mel npys ((T, 80))."""
    results: Dict[str, Dict[str, float]] = {}
    for pred_fp in sorted(Path(pred_dir).glob("*.npy")):
        ref_fp = Path(ref_mel_dir) / pred_fp.name
        if not ref_fp.exists():
            continue
        arr = np.load(pred_fp)
        _, dec, _ = split_acoustic_artifact(arr, n_feats=80)
        ref = np.load(ref_fp)
        if ref.shape[0] == 80 and ref.shape[1] != 80:
            ref = ref.T
        dtw, _, _ = normalized_dtw_score(dec, ref)
        results[pred_fp.stem] = {"mel_l2": mel_l2(dec, ref), "dtw": dtw}
    if out_csv and results:
        new_file = not Path(out_csv).exists()
        with open(out_csv, "a", newline="") as f:
            w = csv.writer(f)
            if new_file:
                w.writerow(["sample_id", "mel_l2", "dtw"])
            for sid in sorted(results):
                w.writerow([sid, results[sid]["mel_l2"], results[sid]["dtw"]])
    return results
