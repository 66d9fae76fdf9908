"""Chained pipeline CLI integration: train -> pipeline (acoustic + quanti)
on the tiny corpus (vocoder/UTMOS stages skipped without checkpoints)."""

import numpy as np
import pytest

from tests.test_cli import tiny_preset  # noqa: F401
from tests.test_data_pipeline import CMU_PATH, corpus  # noqa: F401


@pytest.mark.slow
def test_pipeline_cli(corpus, tiny_preset, tmp_path):  # noqa: F811
    root, filelist = corpus
    from arttts_tpu.cli import pipeline as pipeline_cli
    from arttts_tpu.cli import train as train_cli

    log_dir = tmp_path / "logs"
    train_cli.main([
        "--preset", "tiny_cli", "--data-root", str(root),
        "--train-filelist", filelist, "--cmudict", CMU_PATH,
        "--log-dir", str(log_dir), "--epochs", "1",
    ])

    # ground-truth mels for the quanti stage
    from arttts_tpu.data.datasets import TextMelDataset

    ds = TextMelDataset(filelist, CMU_PATH, data_root_dir=str(root), shuffle=False)
    ref_dir = tmp_path / "refmels"
    ref_dir.mkdir()
    from pathlib import Path

    for i in range(len(ds)):
        np.save(ref_dir / f"{Path(ds.entries[i][0]).stem}.npy", ds[i]["y"])

    workdir = tmp_path / "out"
    pipeline_cli.main([
        "--preset", "tiny_cli", "--ckpt", str(log_dir / "grad_final"),
        "--filelist", filelist, "--data-root", str(root),
        "--cmudict", CMU_PATH, "--workdir", str(workdir),
        "--n-timesteps", "2", "--ref-mel-dir", str(ref_dir),
    ])
    preds = list((workdir / "preds").glob("*.npy"))
    assert len(preds) == 6
    assert (workdir / "quanti_mel.csv").exists()
