"""Corpus quanti harness: artifacts vs synthetic EMA ground truth."""

import numpy as np
import pytest

from arttts_tpu.corpora.ema_metadata import SpeakerMetadata
from arttts_tpu.eval.quanti_corpus import quanti_art_corpus


def test_quanti_art_corpus(tmp_path, rng):
    labels = tmp_path / "labels"
    emas = tmp_path / "ema"
    preds = tmp_path / "preds"
    for d in (labels, emas, preds):
        d.mkdir()
    T = 60
    for i in range(3):
        (labels / f"s{i:03d}.phone").write_text("0 30 a\n30 60 s^\n")
        # smooth trajectories: polyphase 100->50 Hz resampling then matches
        # naive decimation closely (white noise would decorrelate)
        t_ax = np.arange(T)[:, None] / T
        phases = rng.uniform(0, 2 * np.pi, 12)[None, :]
        freqs = rng.uniform(1, 4, 12)[None, :]
        ema = np.sin(2 * np.pi * freqs * t_ax + phases).astype(np.float32)
        ema.tofile(emas / f"s{i:03d}.bin")
        # prediction artifact: (29, T/2) at 50 Hz (EMA is 100 Hz)
        pred = np.zeros((29, T // 2), np.float32)
        # make decoder rows a noisy copy of the downsampled GT (perm-ordered)
        from arttts_tpu.corpora.tables import PB2007_IDX_TO_KEEP

        gt50 = ema[::2][:, PB2007_IDX_TO_KEEP]
        pred[14:26] = gt50.T + 0.01 * rng.standard_normal(gt50.T.shape)
        np.save(preds / f"s{i:03d}.npy", pred)

    meta = SpeakerMetadata("pb2007", "spk", str(tmp_path)).scan(str(labels), str(emas))
    meta.validate_ema()
    results = quanti_art_corpus(
        str(preds), meta, out_csv=str(tmp_path / "q.csv")
    )
    assert len(results) == 3
    for v in results.values():
        assert v["ema_pcc"] > 0.95  # near-copy must correlate strongly
        assert np.isfinite(v["dtw"])
    assert (tmp_path / "q.csv").exists()
