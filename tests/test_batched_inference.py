"""Batched serving-mode inference: masked-norm model, batch > 1, artifacts
match the per-sample contract."""

import dataclasses

import jax
import jax.numpy as jnp
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
from arttts_tpu.infer.pipeline import run_acoustic_inference_batched
from arttts_tpu.models.tts import GradTTSModel


def test_batched_acoustic_inference(tmp_path, rng):
    cfg = ExperimentConfig(
        "tiny_batched",
        ModelConfig(
            name="art_tts",
            n_feats=16,
            encoder=EncoderConfig(
                kind="ipa_trait", n_input_feats=25, n_channels=16,
                filter_channels=32, filter_channels_dp=16, n_heads=1, n_layers=1,
            ),
            decoder=DecoderConfig(dim=8, masked_norm=True),
        ),
        DataConfig(),
        TrainConfig(),
    )

    class FakeDS:
        entries = [[f"wavs/utt{i:03d}.wav"] for i in range(5)]

        def __len__(self):
            return 5

        def __getitem__(self, i):
            T = 6 + 2 * i  # varied lengths exercise padding
            r = np.random.default_rng(i)
            return {"x": r.integers(-1, 2, size=(T, 25)).astype(np.float32)}

    model = GradTTSModel(config=cfg.model)
    ds = FakeDS()
    x0 = np.asarray(ds[0]["x"])[None]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(x0),
        jnp.array([x0.shape[1]]),
        jnp.zeros((1, 32, 16)),
        jnp.ones((1, 32, 1)),
        jnp.zeros((1,)),
    )
    paths = run_acoustic_inference_batched(
        cfg, variables, ds, str(tmp_path / "preds"), batch_size=3, n_timesteps=2
    )
    assert len(paths) == 5
    names = sorted(str(p).split("/")[-1] for p in paths)
    assert names == [f"utt{i:03d}.npy" for i in range(5)]
    for p in paths:
        arr = np.load(p)
        assert arr.shape[0] == 29
        assert np.isfinite(arr).all()
