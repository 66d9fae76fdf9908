"""End-to-end trainer smoke test on the synthetic tiny corpus: a few epochs
of a tiny text->mel model must run, log, checkpoint, and resume."""

import dataclasses

import numpy as np
import pytest

from arttts_tpu.core.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from arttts_tpu.data.datasets import TextMelDataset
from arttts_tpu.train.trainer import Trainer
from arttts_tpu.utils.early_stopping import EarlyStopping

from tests.test_data_pipeline import CMU_PATH, corpus  # noqa: F401  (fixture)


def _tiny_experiment(log_dir):
    model = ModelConfig(
        name="grad_tts",
        n_feats=80,
        encoder=EncoderConfig(
            kind="text",
            n_vocab=149,
            n_channels=32,
            filter_channels=64,
            filter_channels_dp=32,
            n_heads=2,
            n_layers=1,
        ),
        decoder=DecoderConfig(dim=8),
    )
    train = TrainConfig(
        log_dir=str(log_dir),
        n_epochs=2,
        batch_size=2,
        save_every=2,
        val_every=2,
        out_size=32,
    )
    return ExperimentConfig("tiny", model, DataConfig(), train)


def test_trainer_fit_and_resume(corpus, tmp_path):  # noqa: F811
    root, filelist = corpus
    ds = TextMelDataset(
        filelist, CMU_PATH, data_root_dir=str(root), mel_cache_dir=str(root / "mc")
    )
    cfg = _tiny_experiment(tmp_path / "logs")
    trainer = Trainer(cfg, ds, valid_dataset=ds, tb_writer=False)
    trainer.tb = None  # no tensorboard in tests
    metrics = trainer.fit(n_epochs=2)
    assert np.isfinite(metrics["total_loss"])
    # checkpoints written
    assert (tmp_path / "logs" / "grad_2").exists()
    assert (tmp_path / "logs" / "grad_final").exists()

    # resume restores epoch counter and params
    trainer2 = Trainer(cfg, ds, valid_dataset=ds, tb_writer=False)
    trainer2.tb = None
    start = trainer2.resume()
    assert start == 3


def test_trainer_multistep_dispatch(corpus, tmp_path):  # noqa: F811
    """steps_per_dispatch=2 fuses pairs of same-bucket batches into one
    scanned launch (train/step.py:make_train_multistep); odd tails fall back
    to single steps. The epoch must aggregate (K,) metric arrays correctly."""
    root, filelist = corpus
    ds = TextMelDataset(
        filelist, CMU_PATH, data_root_dir=str(root), mel_cache_dir=str(root / "mc")
    )
    cfg = _tiny_experiment(tmp_path / "logs")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_dispatch=2)
    )
    trainer = Trainer(cfg, ds, valid_dataset=None, tb_writer=False)
    trainer.tb = None
    assert trainer.train_multistep is not None
    out = trainer.train_epoch(1)
    assert np.isfinite(out["total_loss"])
    n_batches = sum(1 for _ in trainer.train_loader)
    assert int(trainer.state.step) == n_batches  # every batch stepped once


def test_early_stopping_semantics():
    es = EarlyStopping(patience=2)
    c, gi = es.step([1.0, 1.0, 1.0, 1.0])
    assert c == 0 and gi
    c, gi = es.step([2.0, 2.0, 2.0, 2.0])  # no improvement
    assert c == 1 and not gi
    c, gi = es.step([2.0, 0.5, 2.0, 2.0])  # one subloss improves
    assert c == 0 and not gi
    c, _ = es.step([3.0, 3.0, 3.0, 3.0])
    c, _ = es.step([3.0, 3.0, 3.0, 3.0])
    assert c == 2 and es.should_stop
    # round trip
    es2 = EarlyStopping.from_state_dict(es.state_dict())
    assert es2.counter == es.counter and es2.best_losses == es.best_losses
