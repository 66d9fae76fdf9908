"""Seeded determinism: same key -> identical synthesis; different key ->
different noise draw (regression guard for RNG plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.infer.sampler import synthesize
from arttts_tpu.models.tts import GradTTSModel
from tests.test_model import make_batch, tiny_config


def test_synthesize_deterministic(rng):
    cfg = tiny_config()
    model = GradTTSModel(config=cfg)
    x, x_lengths, y, _ = make_batch(rng, cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, x_lengths, y, jnp.ones((y.shape[0], y.shape[1], 1)), jnp.zeros((2,)),
    )
    k1 = jax.random.PRNGKey(7)
    out1 = synthesize(model, variables, k1, x, x_lengths, n_timesteps=2, max_frames=32)
    out2 = synthesize(model, variables, k1, x, x_lengths, n_timesteps=2, max_frames=32)
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))

    out3 = synthesize(
        model, variables, jax.random.PRNGKey(8), x, x_lengths,
        n_timesteps=2, max_frames=32,
    )
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out3[1]))
    # encoder path (no RNG) identical across keys
    np.testing.assert_allclose(
        np.asarray(out1[0]), np.asarray(out3[0]), atol=1e-6
    )
