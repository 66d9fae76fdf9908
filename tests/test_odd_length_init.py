"""Regression: Trainer must handle datasets whose first item has a frame
count not divisible by the U-Net downsampling factor (caught on real-TPU
smoke training; init previously failed with a shape mismatch)."""

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
from arttts_tpu.train.trainer import Trainer


class OddDS:
    def __len__(self):
        return 4

    def lengths(self):
        return np.array([43, 51, 47, 45])

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        T = [43, 51, 47, 45][i]  # deliberately odd frame counts
        return {
            "x": r.integers(1, 30, size=(9,)).astype(np.int32),
            "y": r.standard_normal((T, 8)).astype(np.float32),
        }


@pytest.mark.slow
def test_trainer_odd_length_init(tmp_path):
    cfg = ExperimentConfig(
        "odd",
        ModelConfig(
            name="grad_tts",
            n_feats=8,
            encoder=EncoderConfig(
                kind="text", n_vocab=30, n_channels=8, filter_channels=16,
                filter_channels_dp=8, n_heads=2, n_layers=1,
            ),
            decoder=DecoderConfig(dim=8),
        ),
        DataConfig(),
        TrainConfig(log_dir=str(tmp_path), batch_size=2, out_size=16,
                    save_every=10, val_every=10),
    )
    trainer = Trainer(cfg, OddDS(), tb_writer=False)
    trainer.tb = None
    metrics = trainer.fit(n_epochs=1)
    assert np.isfinite(metrics["total_loss"])


def test_estimator_rejects_odd_frames(rng):
    import jax
    import jax.numpy as jnp

    from arttts_tpu.models.unet2d import GradLogPEstimator2d

    est = GradLogPEstimator2d(dim=8, n_feats=8)
    x = jnp.zeros((1, 30, 8))  # 30 % 4 != 0
    with pytest.raises(AssertionError, match="fix_len_compatibility"):
        est.init(jax.random.PRNGKey(0), x, jnp.ones((1, 30, 1)), x, jnp.zeros((1,)))
