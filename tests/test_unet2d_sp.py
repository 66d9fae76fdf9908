"""Parity of the sequence-parallel fast U-Net path (`models/unet2d_sp.py`)
against the module forward on an 8-device mesh: identical math, the T axis
sharded over "model", GroupNorm/attention statistics through collectives,
conv halos through ppermute. Also checks the make_score_fn dispatch and the
end-to-end sharded sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from arttts_tpu.models.unet2d_sp import (
    make_sp_score_fn,
    unet2d_sp_supported,
)
from arttts_tpu.parallel.mesh import make_mesh
from tests.test_unet2d_fast import _activate_attention, _cfg, _estimator


def _inputs(B, T, lengths, F, n_spks, seed=11):
    rng = np.random.default_rng(seed)
    xt = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(T)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32)[:, :, None]
    )
    t = jnp.asarray(rng.uniform(0.05, 0.95, size=(B,)).astype(np.float32))
    spk = (
        jnp.asarray(rng.standard_normal((B, 64)).astype(np.float32))
        if n_spks > 1
        else None
    )
    return xt, mu, mask, t, spk


class _ModelShim:
    """make_sp_score_fn only needs .config and (for n_spks > 1)
    .apply(method='embed_speaker'); parity tests drive the estimator
    directly with a precomputed embedding, so n_spks == 1 here."""

    def __init__(self, cfg):
        self.config = cfg


@pytest.mark.parametrize(
    "B,T,lengths",
    [
        (1, 256, [256]),
        (2, 256, [256, 193]),
        (1, 64, [50]),  # dryrun-scale chunks (T_l = 8)
    ],
)
def test_score_sp_parity_vs_module(B, T, lengths):
    assert jax.device_count() >= 8
    cfg = _cfg()
    assert unet2d_sp_supported(cfg, T, 8)
    est = _estimator(cfg)
    F = cfg.n_feats
    xt, mu, mask, t, _ = _inputs(B, T, lengths, F, 1)

    variables = est.init(jax.random.PRNGKey(0), xt, mask, mu, t)
    variables = _activate_attention(variables, np.random.default_rng(0))
    ref = est.apply(variables, xt, mask, mu, t)

    mesh = make_mesh(n_data=1, n_model=8)
    score = make_sp_score_fn(
        _ModelShim(cfg), {"params": {"estimator": variables["params"]}},
        T, mesh,
    )
    seq = NamedSharding(mesh, P(None, "model", None))
    got = score(
        jax.device_put(xt, seq), jax.device_put(mask, seq),
        jax.device_put(mu, seq), t, None,
    )
    # bf16 SP dots vs the module's f32 CPU convs: same tolerance band as
    # the fused fast path's parity test
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=6e-2, rtol=6e-2
    )
    r = np.asarray(ref).ravel()
    gdiff = np.abs(np.asarray(got).ravel() - r)
    assert np.quantile(gdiff, 0.99) < 2e-2 * max(np.abs(r).max(), 1.0)


def test_make_score_fn_dispatch():
    """sharded=True + mesh routes to the SP fast path when supported; the
    kill switch and unsupported geometries fall back to the module."""
    from arttts_tpu.models.unet2d_fast import make_score_fn

    cfg = _cfg()
    est = _estimator(cfg)
    xt, mu, mask, t, _ = _inputs(1, 64, [64], cfg.n_feats, 1)
    variables = est.init(jax.random.PRNGKey(0), xt, mask, mu, t)
    model = _ModelShim(cfg)
    mesh = make_mesh(n_data=1, n_model=8)
    vars_shim = {"params": {"estimator": variables["params"]}}

    fn = make_score_fn(model, vars_shim, T=64, sharded=True, mesh=mesh)
    assert "unet2d_sp" in fn.__module__

    fn = make_score_fn(model, vars_shim, T=60, sharded=True, mesh=mesh)
    assert "unet2d_sp" not in fn.__module__  # 60 % 8 != 0 -> module path

    import os

    os.environ["ARTTTS_DISABLE_UNET_SP"] = "1"
    try:
        fn = make_score_fn(model, vars_shim, T=64, sharded=True, mesh=mesh)
        assert "unet2d_sp" not in fn.__module__
    finally:
        del os.environ["ARTTTS_DISABLE_UNET_SP"]


@pytest.mark.slow
def test_sharded_sampler_uses_sp_fast_path():
    """End to end: reverse_diffusion with a model-axis mesh reproduces the
    unsharded module-path sampler through the SP fast path (the gate is
    verified engaged by test_make_score_fn_dispatch).

    The decoder gets a TAME schedule (beta_max=4): with the reference's
    beta_max=20 and a random-weight score field the 3-step reverse loop
    amplifies the state to |x| ~ 50, where GroupNorm's mean subtraction
    catastrophically cancels bf16 dot rounding — BOTH paths go NaN by
    step 3 and the comparison is meaningless (probe-verified r4). The SP
    math itself is pinned elementwise at parity above."""
    import dataclasses

    from arttts_tpu.infer.sampler import reverse_diffusion
    from arttts_tpu.models.tts import GradTTSModel

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, beta_max=4.0)
    )
    model = GradTTSModel(config=cfg)
    B, T, F = 1, 64, cfg.n_feats
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(1, 10, size=(B, 6)))
    xl = jnp.full((B,), 6, jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, xl, jnp.zeros((B, 32, F)), jnp.ones((B, 32, 1)), jnp.zeros((B,)),
    )
    variables = {
        "params": {
            **variables["params"],
            "estimator": _activate_attention(
                {"params": variables["params"]["estimator"]}, rng
            )["params"],
        }
    }
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)) * 0.3
    z = mu + jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)

    ref = reverse_diffusion(model, variables, z, mask, mu, 3)

    mesh = make_mesh(n_data=1, n_model=8)
    seq = NamedSharding(mesh, P(None, "model", None))
    got = reverse_diffusion(
        model, variables, jax.device_put(z, seq), jax.device_put(mask, seq),
        jax.device_put(mu, seq), 3, sharded=True, mesh=mesh,
    )
    # the reverse loop compounds per-eval bf16-vs-f32 drift, so gate on
    # NORMALIZED error — elementwise parity of one score eval is pinned
    # above at 6e-2
    g, r = np.asarray(got), np.asarray(ref)
    assert np.isfinite(r).all() and np.isfinite(g).all()
    rel = np.linalg.norm(g - r) / np.linalg.norm(r)
    assert rel < 0.02, rel
