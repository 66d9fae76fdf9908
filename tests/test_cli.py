"""CLI smoke tests: train -> synthesize -> quanti chain on the tiny corpus."""

import numpy as np
import pytest

from arttts_tpu.core.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    register_preset,
)

from tests.test_data_pipeline import CMU_PATH, corpus  # noqa: F401


@pytest.fixture(scope="module")
def tiny_preset():
    cfg = ExperimentConfig(
        "tiny_cli",
        ModelConfig(
            name="grad_tts",
            n_feats=80,
            encoder=EncoderConfig(
                kind="text",
                n_vocab=149,
                n_channels=16,
                filter_channels=32,
                filter_channels_dp=16,
                n_heads=2,
                n_layers=1,
            ),
            decoder=DecoderConfig(dim=8),
        ),
        DataConfig(dataset="text_mel"),
        TrainConfig(batch_size=2, save_every=1, val_every=1, out_size=32),
    )
    register_preset(cfg)
    return cfg


def test_cli_train_then_synthesize(corpus, tiny_preset, tmp_path):  # noqa: F811
    root, filelist = corpus
    from arttts_tpu.cli import synthesize as synth_cli
    from arttts_tpu.cli import train as train_cli

    log_dir = tmp_path / "logs"
    train_cli.main(
        [
            "--preset", "tiny_cli",
            "--data-root", str(root),
            "--train-filelist", filelist,
            "--cmudict", CMU_PATH,
            "--log-dir", str(log_dir),
            "--epochs", "1",
        ]
    )
    assert (log_dir / "grad_final").exists()

    pred_dir = tmp_path / "preds"
    synth_cli.main(
        [
            "--preset", "tiny_cli",
            "--ckpt", str(log_dir / "grad_final"),
            "--filelist", filelist,
            "--data-root", str(root),
            "--cmudict", CMU_PATH,
            "--save-dir", str(pred_dir),
            "--n-timesteps", "2",
        ]
    )
    preds = list(pred_dir.glob("*.npy"))
    assert len(preds) == 6
    arr = np.load(preds[0])
    assert arr.shape[0] == 161  # 80 enc + 80 dec + input_map

    # quanti_mel against the dataset's own cached mels
    from arttts_tpu.data.datasets import TextMelDataset
    from arttts_tpu.eval.quanti import quanti_mel

    ds = TextMelDataset(filelist, CMU_PATH, data_root_dir=str(root), shuffle=False)
    ref_dir = tmp_path / "refmels"
    ref_dir.mkdir()
    for i in range(len(ds)):
        stem = __import__("pathlib").Path(ds.entries[i][0]).stem
        np.save(ref_dir / f"{stem}.npy", ds[i]["y"])
    results = quanti_mel(str(pred_dir), str(ref_dir), str(tmp_path / "q.csv"))
    assert len(results) == 6
    assert (tmp_path / "q.csv").exists()
    for v in results.values():
        assert np.isfinite(v["mel_l2"]) and np.isfinite(v["dtw"])
