"""Sequence-parallel inference (`synthesize(mesh=...)`): sharding the
diffusion state's T axis over the mesh's "model" axis must reproduce the
unsharded sampler exactly — GSPMD's spatial conv partitioning (halo
exchange) and attention gathers are the same math, just laid out."""

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.infer.sampler import synthesize
from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.parallel.mesh import make_mesh

from tests.test_model import tiny_config
from tests.test_train_step import _init


def test_sequence_parallel_synthesize_matches_unsharded():
    assert jax.device_count() >= 8
    cfg = tiny_config()
    rng_np = np.random.default_rng(3)
    model, variables, batch = _init(cfg, rng_np, B=2, T_x=8, T_y=32)
    x, xl = batch["x"], batch["x_lengths"]
    T = 64  # must divide by the model-axis size (8)

    kwargs = dict(
        n_timesteps=4, max_frames=T, temperature=1e6,
    )
    enc0, dec0, attn0, yl0 = synthesize(
        model, variables, jax.random.PRNGKey(7), x, xl, **kwargs
    )

    mesh = make_mesh(n_data=1, n_model=8)
    enc1, dec1, attn1, yl1 = synthesize(
        model, variables, jax.random.PRNGKey(7), x, xl, mesh=mesh, **kwargs
    )

    np.testing.assert_array_equal(np.asarray(yl0), np.asarray(yl1))
    np.testing.assert_allclose(
        np.asarray(dec1), np.asarray(dec0), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(enc1), np.asarray(enc0), atol=2e-5, rtol=1e-4
    )
