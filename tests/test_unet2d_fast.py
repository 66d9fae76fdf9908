"""Parity of the fused fast U-Net path (`models/unet2d_fast.py`) against
`GradLogPEstimator2d.apply` — full forward on CPU (kernels in interpret
mode, f32 reference tolerances), masked batches and the spk-plane
variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig
from arttts_tpu.models.unet2d import GradLogPEstimator2d
from arttts_tpu.models.unet2d_fast import (
    score2d_fast,
    unet2d_fast_supported,
)


def _cfg(n_feats=16, n_spks=1, masked_norm=True):
    return ModelConfig(
        name="grad_tts",
        n_feats=n_feats,
        n_spks=n_spks,
        encoder=EncoderConfig(kind="text", n_vocab=10),
        decoder=DecoderConfig(masked_norm=masked_norm),
    )


def _estimator(cfg):
    d = cfg.decoder
    return GradLogPEstimator2d(
        dim=d.dim,
        dim_mults=d.dim_mults,
        groups=d.groups,
        n_spks=cfg.n_spks,
        spk_emb_dim=cfg.spk_emb_dim,
        n_feats=cfg.n_feats,
        pe_scale=d.pe_scale,
        masked_norm=d.masked_norm,
    )


def _activate_attention(variables, rng):
    """Rezero initializes g = 0, which silences every LinearAttention2d —
    a parity test on raw init params never exercises the attention math
    at all (a real latent gap: trained checkpoints have g != 0).  Set
    small distinct gains per site; SMALL because the q@ctx path is
    quadratic in activation magnitude and an untrained cascade of six
    amplifying sites overflows f32."""
    p = dict(variables["params"])
    for k in range(6):
        name = f"Rezero_{k}"
        if name in p:
            g = p[name]["g"]
            val = (0.03 + 0.01 * k) * (-1.0 if k % 2 else 1.0)
            p[name] = {"g": jnp.full_like(g, val)}
    return {"params": p}


@pytest.mark.parametrize("fuse_attn", [True, False])
@pytest.mark.parametrize(
    "B,T,lengths,n_spks",
    [
        (1, 256, [256], 1),
        (2, 256, [256, 193], 1),
        (1, 256, [212], 2),  # spk plane (c_in = 3)
    ],
)
def test_score_fast_parity(B, T, lengths, n_spks, fuse_attn):
    cfg = _cfg(n_spks=n_spks)
    assert unet2d_fast_supported(cfg, T)
    est = _estimator(cfg)
    F = cfg.n_feats
    rng = np.random.default_rng(T + n_spks)
    xt = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(T)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32)[:, :, None]
    )
    t = jnp.asarray(rng.uniform(0.05, 0.95, size=(B,)).astype(np.float32))
    spk = (
        jnp.asarray(rng.standard_normal((B, cfg.spk_emb_dim)).astype(np.float32))
        if n_spks > 1
        else None
    )

    variables = est.init(jax.random.PRNGKey(0), xt, mask, mu, t, spk)
    variables = _activate_attention(variables, rng)
    ref = est.apply(variables, xt, mask, mu, t, spk)

    got = score2d_fast(
        cfg, variables["params"], xt, mask, mu, t, spk, interpret=True,
        fuse_attn=fuse_attn,
    )
    # bf16 kernel dots vs the module's f32 CPU convs: bf16-band tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=6e-2, rtol=6e-2
    )
    # the error should be bf16-rounding, not structural: check correlation
    r = np.asarray(ref).ravel()
    gdiff = np.abs(np.asarray(got).ravel() - r)
    assert np.quantile(gdiff, 0.99) < 2e-2 * max(np.abs(r).max(), 1.0)


def test_unmasked_norm_full_length_matches():
    """masked_norm=False configs (the reference default): the fast path's
    masked statistics coincide when the batch is unpadded."""
    cfg = _cfg(masked_norm=False)
    est = _estimator(cfg)
    B, T, F = 1, 256, cfg.n_feats
    rng = np.random.default_rng(5)
    xt = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)
    t = jnp.full((B,), 0.4, jnp.float32)

    variables = est.init(jax.random.PRNGKey(0), xt, mask, mu, t)
    ref = est.apply(variables, xt, mask, mu, t)
    got = score2d_fast(cfg, variables["params"], xt, mask, mu, t,
                       interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=6e-2, rtol=6e-2
    )


def test_gate():
    cfg = _cfg()
    assert unet2d_fast_supported(cfg, 512)
    assert not unet2d_fast_supported(cfg, 192)  # not a multiple of 256
    from dataclasses import replace

    assert not unet2d_fast_supported(
        replace(cfg, decoder=replace(cfg.decoder, kind="unet1d")), 512
    )
