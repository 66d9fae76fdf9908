"""Pallas MRF stage kernel vs the flax ResBlock composite (interpret mode).

The kernel must reproduce `sum_j ResBlock_j(x) / n` exactly (up to matmul
rounding) including edge behavior at sequence boundaries and tile seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.hifigan import ResBlock
from arttts_tpu.ops.mrf_pallas import mrf_stage, pack_mrf_weights


def _reference(x, params, kernel_sizes, dilations):
    xs = None
    for j, k in enumerate(kernel_sizes):
        block = ResBlock(channels=x.shape[-1], kernel_size=k, dilations=dilations)
        r = block.apply({"params": params[j]}, x)
        xs = r if xs is None else xs + r
    return xs / len(kernel_sizes)


def _init_blocks(rng_key, C, kernel_sizes, dilations):
    params = []
    for j, k in enumerate(kernel_sizes):
        block = ResBlock(channels=C, kernel_size=k, dilations=dilations)
        p = block.init(jax.random.fold_in(rng_key, j), jnp.zeros((1, 64, C)))
        params.append(p["params"])
    return params


@pytest.mark.parametrize(
    "C,T,kernel_sizes",
    [
        (32, 2048, (3, 7, 11)),
        (64, 1024, (3, 7, 11)),
        (128, 512, (3,)),
        (256, 256, (3, 7)),
    ],
)
def test_mrf_stage_matches_resblocks(rng, C, T, kernel_sizes, monkeypatch):
    if C > 128:
        import arttts_tpu.ops.mrf_pallas as mp
        monkeypatch.setattr(mp, "ALLOW_WIDE_CHANNELS", True)
    dilations = (1, 3, 5)
    params = _init_blocks(jax.random.PRNGKey(3), C, kernel_sizes, dilations)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))

    want = np.asarray(_reference(x, params, kernel_sizes, dilations))
    weights = pack_mrf_weights(params, C)
    got = np.asarray(
        mrf_stage(x, weights, kernel_sizes, dilations, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("packed_chain", [False, True])
def test_hifigan_forward_fast_matches_module(rng, packed_chain, monkeypatch):
    """Full generator: Pallas-MRF fast path == vocoder.apply (all four
    upsample stages, incl. the C=256 XLA fallback), with and without the
    stage-chained packed upsample kernels."""
    import arttts_tpu.ops.upsample_pallas as ups
    from arttts_tpu.models.hifigan import HiFiGANGenerator, hifigan_forward_fast

    monkeypatch.setattr(ups, "ENABLE_PACKED_CHAIN", packed_chain)
    vocoder = HiFiGANGenerator()
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    variables = jax.jit(vocoder.init)(jax.random.PRNGKey(0), mel)
    want = np.asarray(vocoder.apply(variables, mel))
    got = np.asarray(hifigan_forward_fast(vocoder, variables, mel, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_mrf_stage_batch_sharded(rng):
    """Under an 8-device data mesh the kernel partitions per batch shard
    (custom_partitioning rule) and matches the unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    C, T = 32, 1024
    kernel_sizes, dilations = (3,), (1, 3, 5)
    params = _init_blocks(jax.random.PRNGKey(5), C, kernel_sizes, dilations)
    weights = pack_mrf_weights(params, C)
    x = jnp.asarray(rng.standard_normal((8, T, C)).astype(np.float32))
    want = np.asarray(
        mrf_stage(x, weights, kernel_sizes, dilations, interpret=True)
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got = np.asarray(
        mrf_stage(xs, weights, kernel_sizes, dilations, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("packed_chain", [False, True])
def test_sparc_forward_fast_matches_module(rng, packed_chain, monkeypatch):
    """SPARC FiLM generator: Pallas fast path == module apply (FiLM vectors
    threaded into the kernel; C=256 stage on the XLA fallback), with and
    without the stage-chained packed upsample path."""
    import arttts_tpu.ops.upsample_pallas as ups

    from arttts_tpu.models.hifigan import (
        SpkSparcHiFiGANGenerator,
        spk_sparc_forward_fast,
    )

    monkeypatch.setattr(ups, "ENABLE_PACKED_CHAIN", packed_chain)
    module = SpkSparcHiFiGANGenerator()
    c = jnp.asarray(rng.standard_normal((1, 8, 14)).astype(np.float32))
    spk_ft = jnp.asarray(rng.standard_normal((1, 1024)).astype(np.float32))
    variables = jax.jit(module.init)(jax.random.PRNGKey(1), c, spk_ft)
    want = np.asarray(module.apply(variables, c, spk_ft))
    got = np.asarray(
        spk_sparc_forward_fast(module, variables, c, spk_ft, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_mrf_stage_tile_seams(rng):
    """Multiple time tiles: values near tile boundaries must match the
    single-tile reference (halo DMA correctness)."""
    C, T = 32, 8192  # forces >= 2 tiles at the C=32 tile size cap of 4096
    kernel_sizes, dilations = (11,), (1, 3, 5)
    params = _init_blocks(jax.random.PRNGKey(4), C, kernel_sizes, dilations)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    want = np.asarray(_reference(x, params, kernel_sizes, dilations))
    got = np.asarray(
        mrf_stage(x, pack_mrf_weights(params, C), kernel_sizes, dilations,
                  interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_mrf_stage_bf16_tracks_f32(rng):
    """Opt-in bf16 dot path (ARTTTS_MRF_BF16 / bf16=True): same math at
    bfloat16 matmul precision with f32 accumulation — must track the f32
    kernel within bf16 rounding bands through a full stage (18 convs of
    residual accumulation)."""
    C, T = 64, 512
    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    params = _init_blocks(jax.random.PRNGKey(5), C, kernel_sizes, dilations)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    weights = pack_mrf_weights(params, C)
    f32 = np.asarray(
        mrf_stage(x, weights, kernel_sizes, dilations, interpret=True,
                  bf16=False)
    )
    b16 = np.asarray(
        mrf_stage(x, weights, kernel_sizes, dilations, interpret=True,
                  bf16=True)
    )
    rel = np.abs(b16 - f32) / (np.abs(f32).mean() + 1e-6)
    assert rel.max() < 0.05, rel.max()
    assert np.sqrt(((b16 - f32) ** 2).mean()) < 0.01 * np.abs(f32).std()
