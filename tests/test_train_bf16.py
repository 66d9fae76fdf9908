"""Numerics gate for bf16-activation training (VERDICT r4 #5).

The throughput recipe (scripts/sweep_train.py: decoder compute_dtype
bfloat16 + K-step dispatch measured 5.57 ms/step vs 6.00 f32 on v5e) is
only shippable if the training signal survives the precision drop: same
params, same batch, same RNG — the bf16 step's loss and gradient direction
must track the f32 step within the bf16 rounding band.  The time-embedding
phases stay f32 by construction (`DecoderConfig.compute_dtype` note in
CLAUDE.md), which this test would catch regressing.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.core.config import get_preset
from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.train.step import create_train_state, make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_preset("test_tiny") if _has_tiny() else None
    if cfg is None:
        cfg = _shrunk_v1()
    rng = np.random.default_rng(0)
    B, Tx, Ty = 2, 24, 64
    F_in = cfg.model.encoder.n_input_feats
    batch = {
        "x": jnp.asarray(
            rng.integers(-1, 2, size=(B, Tx, F_in)).astype(np.float32)
        ),
        "x_lengths": jnp.full((B,), Tx, jnp.int32),
        "y": jnp.asarray(
            rng.standard_normal((B, Ty, cfg.model.n_feats)).astype(np.float32)
        ),
        "y_lengths": jnp.full((B,), Ty, jnp.int32),
    }
    return cfg, batch


def _has_tiny():
    try:
        get_preset("test_tiny")
        return True
    except Exception:
        return False


def _shrunk_v1():
    cfg = get_preset("v1")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            encoder=dataclasses.replace(
                cfg.model.encoder,
                n_channels=32,
                filter_channels=64,
                filter_channels_dp=64,
                n_layers=1,
            ),
            decoder=dataclasses.replace(cfg.model.decoder, dim=16),
        ),
    )


def _step_metrics(cfg, batch, compute_dtype):
    mcfg = dataclasses.replace(
        cfg.model,
        decoder=dataclasses.replace(
            cfg.model.decoder, compute_dtype=compute_dtype
        ),
    )
    model = GradTTSModel(config=mcfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        batch["x"], batch["x_lengths"], batch["y"][:, :32],
        jnp.ones((batch["y"].shape[0], 32, 1)),
        jnp.zeros((batch["y"].shape[0],)),
    )
    state = create_train_state(model, variables, 1e-4, 1.0)

    import optax

    def loss_of(params):
        from arttts_tpu.train.losses import grad_tts_loss

        total, parts = grad_tts_loss(
            model, {"params": params}, jax.random.PRNGKey(7),
            batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
            out_size=32, train=True,
        )
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_of, has_aux=True)(
        state.params
    )
    return float(total), grads


def test_bf16_training_numerics(tiny_setup):
    cfg, batch = tiny_setup
    loss_f32, g_f32 = _step_metrics(cfg, batch, "float32")
    loss_bf16, g_bf16 = _step_metrics(cfg, batch, "bfloat16")

    # loss within the bf16 band
    assert abs(loss_bf16 - loss_f32) <= 0.02 * max(abs(loss_f32), 1.0), (
        loss_f32, loss_bf16,
    )

    # gradient direction: global cosine similarity across the whole tree
    fa, _ = jax.flatten_util.ravel_pytree(g_f32)
    fb, _ = jax.flatten_util.ravel_pytree(g_bf16)
    fa = np.asarray(fa)
    fb = np.asarray(fb)
    cos = float(
        np.dot(fa, fb) / (np.linalg.norm(fa) * np.linalg.norm(fb) + 1e-12)
    )
    assert cos > 0.99, cos
    # magnitudes comparable (no silent underflow of a parameter group)
    ratio = np.linalg.norm(fb) / (np.linalg.norm(fa) + 1e-12)
    assert 0.8 < ratio < 1.25, ratio
