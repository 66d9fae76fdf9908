"""Tensor parallelism (`parallel/tp.py`): the train step over a
("data", "model") mesh must (1) really lay parameters + Adam moments out
across the model axis, and (2) reproduce the single-device step exactly —
GSPMD inserts the cross-shard collectives, so sharded math is the same
math."""

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from arttts_tpu.parallel.tp import shard_tp, tp_sharding
from arttts_tpu.train.step import create_train_state, make_train_step

from tests.test_model import tiny_config
from tests.test_train_step import _init


def _n_model_shards(arr):
    spec = arr.sharding.spec
    return len(arr.sharding.mesh.devices.flatten()) if spec else 1


def test_tp_rule_shards_channel_axes():
    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = tiny_config()
    rng_np = np.random.default_rng(7)
    model, variables, _ = _init(cfg, rng_np, B=8)
    shardings = tp_sharding(mesh, variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    sharded = [
        (path, s) for path, s in leaves if "model" in jax.tree_util.tree_leaves(
            [ax for ax in s.spec if ax is not None]
        )
    ]
    # the rule must actually engage on this model (Dense/Conv kernels)
    assert len(sharded) > 10, f"only {len(sharded)} sharded leaves"
    # and every sharded leaf is sharded on its LAST axis only
    params = variables["params"]
    flat_params = dict(jax.tree_util.tree_leaves_with_path(params))
    for path, s in sharded:
        shape = flat_params[path].shape
        assert s.spec[-1] == "model" and all(a is None for a in s.spec[:-1])
        assert shape[-1] % 2 == 0


def test_tp_step_matches_single_device():
    assert jax.device_count() >= 8
    cfg = tiny_config()
    rng_np = np.random.default_rng(5)
    model, variables, batch = _init(cfg, rng_np, B=8)

    # single-device baseline
    state_1 = create_train_state(model, variables, 1e-4)
    step_1 = make_train_step(model, out_size=16, donate=False)
    new_1, metrics_1 = step_1(state_1, jax.random.PRNGKey(1), batch)

    # 4-way data x 2-way model
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_tp(mesh, create_train_state(model, variables, 1e-4))
    sharded = shard_batch(mesh, batch)
    step = make_train_step(model, out_size=16, mesh=mesh, donate=False)
    new_state, metrics = step(state, jax.random.PRNGKey(1), sharded)

    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(metrics_1["total_loss"]), rtol=1e-4
    )

    # the updated state must STAY model-sharded (out_shardings must not
    # gather it back) ...
    some_sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(new_state.params)
        if any(ax == "model" for ax in leaf.sharding.spec)
    ]
    assert some_sharded, "updated params lost their model-axis sharding"
    # ... and Adam moments are sharded too (the ZeRO-3-flavoured bonus)
    mu_sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(new_state.opt_state)
        if getattr(leaf, "ndim", 0) >= 2
        and any(ax == "model" for ax in leaf.sharding.spec)
    ]
    assert mu_sharded, "optimizer moments are not model-sharded"

    # updated parameters agree with the single-device run
    l_tp = jax.tree_util.tree_leaves(new_state.params)[-1]
    l_1 = jax.tree_util.tree_leaves(new_1.params)[-1]
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_1), atol=1e-5)


def test_tp_composes_with_dp_replicated_state():
    """A replicated state through the SAME step builder still works (the
    in_shardings relaxation must not break plain DP)."""
    assert jax.device_count() >= 8
    cfg = tiny_config()
    rng_np = np.random.default_rng(5)
    model, variables, batch = _init(cfg, rng_np, B=8)
    mesh = make_mesh(n_data=8)
    state = replicate(mesh, create_train_state(model, variables, 1e-4))
    step = make_train_step(model, out_size=16, mesh=mesh, donate=False)
    _, metrics = step(state, jax.random.PRNGKey(1), shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["total_loss"]))
