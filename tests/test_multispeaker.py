"""Speaker-table multi-speaker path (n_spks > 1 with integer ids): encoder
concat + third U-Net channel, loss and sampling."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig
from arttts_tpu.infer.sampler import synthesize
from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.train.losses import grad_tts_loss


@pytest.mark.slow
def test_spk_table_path(rng):
    cfg = ModelConfig(
        name="grad_tts",
        n_feats=8,
        n_spks=4,
        spk_emb_dim=8,
        encoder=EncoderConfig(
            kind="text", n_vocab=30, n_channels=8, filter_channels=16,
            filter_channels_dp=8, n_heads=2, n_layers=1,
        ),
        decoder=DecoderConfig(dim=8),
    )
    model = GradTTSModel(config=cfg)
    B, T_x, T_y = 2, 6, 16
    x = jnp.asarray(rng.integers(1, 30, (B, T_x)))
    x_lengths = jnp.array([T_x, T_x - 2])
    y = jnp.asarray(rng.standard_normal((B, T_y, 8)).astype(np.float32))
    y_lengths = jnp.array([T_y, T_y - 4])
    spk = jnp.array([0, 3])
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((B, T_y, 1)), jnp.zeros((B,)), spk,
    )
    assert "spk_table" in variables["params"]

    total, parts = grad_tts_loss(
        model, variables, key, x, x_lengths, y, y_lengths, spk=spk, out_size=8
    )
    assert np.isfinite(float(total))

    enc, dec, attn, y_len = synthesize(
        model, variables, key, x, x_lengths, n_timesteps=2, max_frames=32,
        spk=spk,
    )
    assert np.isfinite(np.asarray(dec)).all()

    # different speakers give different outputs
    enc2, _, _, _ = synthesize(
        model, variables, key, x, x_lengths, n_timesteps=2, max_frames=32,
        spk=jnp.array([1, 1]),
    )
    assert not np.allclose(np.asarray(enc), np.asarray(enc2))
