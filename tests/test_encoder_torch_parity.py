"""Numeric parity of encoder blocks vs minimal torch replicas of the
glow-tts-lineage math (channel LayerNorm, masked convs, windowed
relative-position attention with the skew trick)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from arttts_tpu.models.layers import (
    ChannelLayerNorm,
    RelPositionMultiHeadAttention,
    _abs_to_rel,
    _rel_to_abs,
)


def test_channel_layernorm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 5)).astype(np.float32)
    ln = ChannelLayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(ln.apply(params, jnp.asarray(x)))
    # reference LayerNorm: normalize channel dim with eps 1e-4, affine=1/0
    xt = torch.from_numpy(x)
    mean = xt.mean(-1, keepdim=True)
    var = ((xt - mean) ** 2).mean(-1, keepdim=True)
    want = ((xt - mean) * torch.rsqrt(var + 1e-4)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _torch_rel_attention(q, k, v, emb_rel_k, emb_rel_v, window, mask=None):
    """Direct (unskewed) implementation of windowed relative attention:
    logits[i, j] += q_i . e_{j-i} with e zero outside the window — the
    semantics the skew trick computes."""
    B, H, L, D = q.shape
    scores = q @ k.transpose(-2, -1) / math.sqrt(D)
    # build (2L-1, D) zero-padded relative table centered at L-1
    rel = torch.zeros(2 * L - 1, D)
    for d in range(-window, window + 1):
        if abs(d) <= L - 1:
            rel[L - 1 + d] = emb_rel_k[0, window + d]
    rel_logits = torch.zeros(B, H, L, L)
    for i in range(L):
        for j in range(L):
            rel_logits[:, :, i, j] = (q[:, :, i] * rel[L - 1 + (j - i)]).sum(-1)
    scores = scores + rel_logits / math.sqrt(D)
    if mask is not None:
        scores = scores.masked_fill(mask == 0, -1e4)
    p = torch.softmax(scores, dim=-1)
    out = p @ v
    relv = torch.zeros(2 * L - 1, D)
    for d in range(-window, window + 1):
        if abs(d) <= L - 1:
            relv[L - 1 + d] = emb_rel_v[0, window + d]
    for i in range(L):
        acc = torch.zeros(B, H, D)
        for j in range(L):
            acc += p[:, :, i, j, None] * relv[L - 1 + (j - i)]
        out[:, :, i] += acc
    return out


def test_rel_attention_matches_direct_torch(rng):
    B, L, C, H, W = 2, 10, 8, 2, 4
    D = C // H
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    attn = RelPositionMultiHeadAttention(
        channels=C, out_channels=C, n_heads=H, window_size=W
    )
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(attn.apply({"params": params}, jnp.asarray(x)))

    # replicate in torch using the same weights
    def dense(name, inp):
        W_ = torch.from_numpy(np.asarray(params[name]["kernel"]))
        b_ = torch.from_numpy(np.asarray(params[name]["bias"]))
        return inp @ W_ + b_

    xt = torch.from_numpy(x)
    q = dense("Dense_0", xt).reshape(B, L, H, D).permute(0, 2, 1, 3)
    k = dense("Dense_1", xt).reshape(B, L, H, D).permute(0, 2, 1, 3)
    v = dense("Dense_2", xt).reshape(B, L, H, D).permute(0, 2, 1, 3)
    emb_rel_k = torch.from_numpy(np.asarray(params["emb_rel_k"]))
    emb_rel_v = torch.from_numpy(np.asarray(params["emb_rel_v"]))
    out = _torch_rel_attention(q, k, v, emb_rel_k, emb_rel_v, W)
    out = out.permute(0, 2, 1, 3).reshape(B, L, C)
    want = dense("Dense_3", out).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_skew_helpers_roundtrip(rng):
    B, H, L = 1, 2, 6
    x = jnp.asarray(rng.standard_normal((B, H, L, 2 * L - 1)).astype(np.float32))
    absd = _rel_to_abs(x)
    assert absd.shape == (B, H, L, L)
    # abs->rel recovers the used diagonal entries
    back = _abs_to_rel(absd)
    for i in range(L):
        for j in range(L):
            d = j - i + L - 1
            np.testing.assert_allclose(back[0, 0, i, d], absd[0, 0, i, j], atol=1e-6)
