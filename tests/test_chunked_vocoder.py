"""Chunked fixed-shape vocoding (`infer/chunked.py`) must reproduce
full-length vocoding exactly: every kept output frame sits >= halo frames
from any non-sequence-edge window boundary, and halo exceeds the
generator's receptive radius (~13 input frames for the stock kernel
layout), so stitching is equality, not crossfade approximation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arttts_tpu.infer.chunked import _window_starts, vocode_chunked
from arttts_tpu.models.hifigan import HiFiGANGenerator

CHUNK, HALO = 32, 16
W = CHUNK + 2 * HALO
HOP = 256


@pytest.fixture(scope="module")
def small_gen():
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    mel = jnp.zeros((1, W, 80))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    apply = jax.jit(lambda v, m: gen.apply(v, m))
    return gen, variables, apply


def test_window_geometry():
    # every kept frame >= halo from a window edge unless that edge is a
    # true sequence edge (start == 0 or start == T - W)
    for T in (97, 128, 200, 513):
        starts, keeps = _window_starts(T, CHUNK, HALO)
        covered = []
        for s, (g, l, k) in zip(starts, keeps):
            assert 0 <= s <= T - W
            assert s + l == g and l + k <= W
            if s > 0:
                assert l >= HALO
            if s < T - W:
                assert W - (l + k) >= HALO
            covered.append((g, g + k))
        # kept ranges tile [0, T) exactly
        covered.sort()
        assert covered[0][0] == 0 and covered[-1][1] == T
        for (a, b), (c, d) in zip(covered, covered[1:]):
            assert b == c


@pytest.mark.parametrize("T", [200, 129])
def test_chunked_equals_full(small_gen, T):
    gen, variables, apply = small_gen
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((T, 80)).astype(np.float32) * 0.5
    full = np.asarray(apply(variables, jnp.asarray(feats[None])))[0, :, 0]
    chunked = vocode_chunked(
        apply, variables, feats, chunk=CHUNK, halo=HALO, win_batch=3, hop=HOP
    )
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=1e-5)


@pytest.mark.parametrize("T", [W - 10, W, 40])
def test_short_input_exact(small_gen, T):
    # T <= W: two placements (flush-left head + flush-right tail) must equal
    # TRUE full-length vocoding — zero input frames pass through conv
    # biases, so a single padded window would diverge near the right edge
    gen, variables, apply = small_gen
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((T, 80)).astype(np.float32) * 0.5
    full = np.asarray(apply(variables, jnp.asarray(feats[None])))[0, :, 0]
    chunked = vocode_chunked(
        apply, variables, feats, chunk=CHUNK, halo=HALO, hop=HOP
    )
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=1e-5)


def test_insufficient_halo_actually_diverges(small_gen):
    # sanity that the exactness above is load-bearing: a halo far below the
    # receptive radius must NOT match (otherwise the test proves nothing)
    gen, variables, apply = small_gen
    rng = np.random.default_rng(2)
    T = 200
    feats = rng.standard_normal((T, 80)).astype(np.float32) * 0.5
    full = np.asarray(apply(variables, jnp.asarray(feats[None])))[0, :, 0]
    chunked = vocode_chunked(
        apply, variables, feats, chunk=32, halo=1, win_batch=3, hop=HOP
    )
    assert np.abs(chunked - full).max() > 1e-4
