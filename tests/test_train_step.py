"""Training-step tests incl. data parallelism over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from arttts_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_multistep,
    make_train_step,
)

from tests.test_model import make_batch, tiny_config


def _init(cfg, rng_np, B=8, T_x=8, T_y=32):
    model = GradTTSModel(config=cfg)
    if cfg.encoder.kind == "text":
        x = jnp.asarray(rng_np.integers(1, cfg.encoder.n_vocab, size=(B, T_x)))
    else:
        x = jnp.asarray(
            rng_np.integers(-1, 2, size=(B, T_x, cfg.encoder.n_input_feats)).astype(
                np.float32
            )
        )
    x_lengths = jnp.asarray(
        rng_np.integers(T_x // 2, T_x + 1, size=(B,)).astype(np.int32)
    )
    y = jnp.asarray(rng_np.standard_normal((B, T_y, cfg.n_feats)).astype(np.float32))
    y_lengths = jnp.asarray(
        rng_np.integers(T_y // 2, T_y + 1, size=(B,)).astype(np.int32)
    )
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x,
        x_lengths,
        y,
        jnp.ones((B, T_y, 1)),
        jnp.zeros((B,)),
    )
    batch = {"x": x, "x_lengths": x_lengths, "y": y, "y_lengths": y_lengths}
    return model, variables, batch


def test_train_step_single_device(rng):
    cfg = tiny_config()
    model, variables, batch = _init(cfg, rng, B=2)
    state = create_train_state(model, variables, 1e-4)
    step = make_train_step(model, out_size=16, donate=False)
    new_state, metrics = step(state, jax.random.PRNGKey(1), batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually changed somewhere
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.sum(jnp.abs(a - b))), state.params, new_state.params
    )
    assert sum(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_train_step_data_parallel_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    rng_np = np.random.default_rng(5)
    model, variables, batch = _init(cfg, rng_np, B=8)
    mesh = make_mesh(n_data=8)

    state = create_train_state(model, variables, 1e-4)
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch)

    step = make_train_step(model, out_size=16, mesh=mesh, donate=False)
    new_state, metrics = step(state, jax.random.PRNGKey(1), sharded)
    assert np.isfinite(float(metrics["total_loss"]))

    # DP must agree with the single-device step on the same batch
    step_1dev = make_train_step(model, out_size=16, donate=False)
    state_1 = create_train_state(model, variables, 1e-4)
    new_state_1, metrics_1 = step_1dev(state_1, jax.random.PRNGKey(1), batch)
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(metrics_1["total_loss"]), rtol=1e-4
    )
    # parameters after one step agree
    l_mesh = jax.tree_util.tree_leaves(new_state.params)[-1]
    l_1 = jax.tree_util.tree_leaves(new_state_1.params)[-1]
    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_1), atol=1e-5)


def test_train_step_mesh_pallas_mas(monkeypatch):
    """The exact multi-chip code path real TPU hardware takes: pallas MAS
    (interpret mode on CPU) under the GSPMD-sharded train step, partitioned
    by the kernel's custom_partitioning batch rule."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    rng_np = np.random.default_rng(5)
    model, variables, batch = _init(cfg, rng_np, B=8)
    mesh = make_mesh(n_data=8)

    state = replicate(mesh, create_train_state(model, variables, 1e-4))
    sharded = shard_batch(mesh, batch)

    monkeypatch.setenv("ARTTTS_MAS_BACKEND", "pallas")
    step = make_train_step(model, out_size=16, mesh=mesh, donate=False)
    _, metrics_p = step(state, jax.random.PRNGKey(1), sharded)
    monkeypatch.delenv("ARTTTS_MAS_BACKEND")

    step_scan = make_train_step(model, out_size=16, mesh=mesh, donate=False)
    _, metrics_s = step_scan(state, jax.random.PRNGKey(1), sharded)
    np.testing.assert_allclose(
        float(metrics_p["total_loss"]), float(metrics_s["total_loss"]), rtol=1e-5
    )


def test_train_multistep_matches_sequential(rng):
    """K scanned steps == K sequential dispatches with fold_in(rng, i) keys
    (the multistep contract: one launch, identical optimizer trajectory)."""
    cfg = tiny_config()
    model, variables, batch = _init(cfg, rng, B=2)
    K = 3
    rng2 = np.random.default_rng(7)
    batches = jax.tree_util.tree_map(
        lambda x: jnp.stack(
            [x] * K
        ) if x.dtype in (jnp.int32, jnp.int64) else jnp.stack(
            [x + 0.01 * jnp.asarray(rng2.standard_normal(x.shape), x.dtype)
             for _ in range(K)]
        ),
        batch,
    )
    base = jax.random.PRNGKey(3)

    state_m = create_train_state(model, variables, 1e-4)
    multi = make_train_multistep(model, out_size=16, n_steps=K, donate=False)
    new_m, metrics_m = multi(state_m, base, batches)
    assert int(new_m.step) == K
    assert metrics_m["total_loss"].shape == (K,)

    state_s = create_train_state(model, variables, 1e-4)
    step = make_train_step(model, out_size=16, donate=False)
    losses = []
    for i in range(K):
        bi = jax.tree_util.tree_map(lambda x: x[i], batches)
        state_s, met = step(state_s, jax.random.fold_in(base, i), bi)
        losses.append(float(met["total_loss"]))
    np.testing.assert_allclose(
        np.asarray(metrics_m["total_loss"]), np.asarray(losses), rtol=1e-5
    )
    l_m = jax.tree_util.tree_leaves(new_m.params)[-1]
    l_s = jax.tree_util.tree_leaves(state_s.params)[-1]
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_s), atol=1e-6)


def test_train_multistep_data_parallel_mesh():
    """Multistep under GSPMD DP: batches (K, B, ...) shard over "data" on
    axis 1; losses match the single-device multistep."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    rng_np = np.random.default_rng(5)
    model, variables, batch = _init(cfg, rng_np, B=8)
    K = 2
    batches = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), batch)
    mesh = make_mesh(n_data=8)
    base = jax.random.PRNGKey(3)

    state = replicate(mesh, create_train_state(model, variables, 1e-4))
    multi = make_train_multistep(
        model, out_size=16, n_steps=K, mesh=mesh, donate=False
    )
    new_state, metrics = multi(state, base, batches)
    assert int(new_state.step) == K

    state_1 = create_train_state(model, variables, 1e-4)
    multi_1 = make_train_multistep(model, out_size=16, n_steps=K, donate=False)
    _, metrics_1 = multi_1(state_1, base, batches)
    np.testing.assert_allclose(
        np.asarray(metrics["total_loss"]),
        np.asarray(metrics_1["total_loss"]),
        rtol=1e-4,
    )


def test_eval_step(rng):
    cfg = tiny_config()
    model, variables, batch = _init(cfg, rng, B=2)
    state = create_train_state(model, variables, 1e-4)
    ev = make_eval_step(model)
    metrics = ev(state, jax.random.PRNGKey(2), batch)
    assert np.isfinite(float(metrics["total_loss"]))
