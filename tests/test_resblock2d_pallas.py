"""Interpret-mode parity of the fused ResnetBlock2d Pallas kernel
(`ops/resblock2d_pallas.py`) against the flax modules it replaces
(`models/unet2d.py:84-122`): every input width the U-Net uses at C=64
output (2 = stacked planes, 64 = body, 256 = up-path skip concat), both
resolutions (80- and 40-row images), masked batches, and the final
Block2d variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.unet2d import Block2d, ResnetBlock2d
from arttts_tpu.ops.resblock2d_pallas import (
    pack_block_params,
    pack_image,
    pack_lane_vec,
    pack_resblock_params,
    resblock2d_packed,
    split_pack_image,
    unpack_image,
)

C = 64


def _inputs(rng, B, H, T, c_in, lengths):
    x = rng.standard_normal((B, H, T, c_in)).astype(np.float32)
    mask = (np.arange(T)[None, :] < np.asarray(lengths)[:, None]).astype(
        np.float32
    )[:, None, :, None]
    temb = rng.standard_normal((B, C)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(mask), jnp.asarray(temb)


def _tvec(p, temb):
    t = jnp.tanh(jax.nn.softplus(temb)) * temb  # mish
    t = t @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    return jax.vmap(pack_lane_vec)(t)


@pytest.mark.parametrize(
    "c_in,B,H,T,lengths",
    [
        (64, 1, 80, 256, [256]),
        (64, 2, 80, 256, [256, 173]),
        (2, 1, 80, 128, [90]),
        (128, 2, 80, 128, [128, 77]),
        (256, 1, 40, 128, [100]),  # up-path skip concat at half resolution
        (64, 1, 40, 128, [128]),
    ],
)
def test_resblock_parity(c_in, B, H, T, lengths):
    rng = np.random.default_rng(c_in + T + H)
    x, mask, temb = _inputs(rng, B, H, T, c_in, lengths)

    mod = ResnetBlock2d(dim_out=C, masked_norm=True)
    variables = mod.init(jax.random.PRNGKey(0), x, mask, temb)
    ref = mod.apply(variables, x, mask, temb)

    p = variables["params"]
    params = pack_resblock_params(p, c_in)
    xs = split_pack_image(x)
    lens = jnp.asarray(lengths, jnp.int32)
    tvec = _tvec(p, temb)

    # f32 dots: tight parity (the kernel's math is exactly the module's)
    out_p = resblock2d_packed(
        xs, lens, tvec, params, c_in=c_in, interpret=True, bf16=False
    )
    got = unpack_image(out_p)
    # masked positions: the module leaves pad frames at the residual's
    # value (bias for projected residuals, 0 for identity) — compare all
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    # bf16 dots (the hardware mode, matching XLA's conv numerics on v5e):
    # loose tolerance, bf16 rounding dominates
    out_b = resblock2d_packed(
        xs, lens, tvec, params, c_in=c_in, interpret=True, bf16=True
    )
    np.testing.assert_allclose(
        np.asarray(unpack_image(out_b)), np.asarray(ref), atol=5e-2, rtol=5e-2
    )


def test_block_only_parity():
    rng = np.random.default_rng(7)
    B, H, T = 2, 80, 128
    lengths = [128, 101]
    x, mask, _ = _inputs(rng, B, H, T, 64, lengths)

    mod = Block2d(dim_out=C, masked_norm=True)
    variables = mod.init(jax.random.PRNGKey(0), x, mask)
    ref = mod.apply(variables, x, mask)

    params = pack_block_params(variables["params"])
    out_p = resblock2d_packed(
        (pack_image(x),),
        jnp.asarray(lengths, jnp.int32),
        jnp.zeros((B, 128), jnp.float32),
        params,
        c_in=64,
        block_only=True,
        interpret=True,
        bf16=False,
    )
    got = unpack_image(out_p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 80, 64, C)).astype(np.float32))
    assert jnp.array_equal(unpack_image(pack_image(x)), x)
    x2 = jnp.asarray(rng.standard_normal((1, 80, 64, 2)).astype(np.float32))
    assert jnp.array_equal(unpack_image(pack_image(x2), C=2), x2)


@pytest.mark.parametrize(
    "c_out,c_chunks,B,H,T,lengths",
    [
        (128, (64,), 1, 40, 128, [128]),    # L2 entry (downsampled input)
        (128, (128,), 2, 40, 128, [128, 91]),
        (256, (256,), 1, 20, 128, [77]),    # L3 body
        (128, (256, 256), 1, 20, 128, [128]),  # first up: mid + skip concat
    ],
)
def test_resblock_wide_parity(c_out, c_chunks, B, H, T, lengths):
    from arttts_tpu.ops.resblock2d_pallas import (
        pack_resblock_params_wide,
        pad_wide,
        resblock2d_wide,
        unpad_wide,
    )

    c_in = sum(c_chunks)
    rng = np.random.default_rng(c_out + c_in + H)
    x, mask, temb = _inputs(rng, B, H, T, c_in, lengths)

    mod = ResnetBlock2d(dim_out=c_out, masked_norm=True)
    variables = mod.init(jax.random.PRNGKey(0), x, mask, temb)
    ref = mod.apply(variables, x, mask, temb)

    p = variables["params"]
    params = pack_resblock_params_wide(p, c_chunks, c_out)
    tv = jnp.tanh(jax.nn.softplus(temb)) * temb
    tv = tv @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]  # (B, c_out)

    offs = np.cumsum((0,) + c_chunks)
    xs = tuple(
        pad_wide(x[..., offs[j] : offs[j + 1]]) for j in range(len(c_chunks))
    )
    lens = jnp.asarray(lengths, jnp.int32)

    got = unpad_wide(
        resblock2d_wide(xs, lens, tv, params, c_out=c_out, interpret=True,
                        bf16=False)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    got_b = unpad_wide(
        resblock2d_wide(xs, lens, tv, params, c_out=c_out, interpret=True,
                        bf16=True)
    )
    np.testing.assert_allclose(
        np.asarray(got_b), np.asarray(ref), atol=6e-2, rtol=6e-2
    )


@pytest.mark.parametrize(
    "c_chunks,B,H,T,lengths",
    [
        ((128, 128), 1, 40, 128, [128]),  # up-path concat -> 64 channels
        ((64,), 2, 40, 128, [128, 93]),   # identity body block
    ],
)
def test_resblock_wide_real64_parity(c_chunks, B, H, T, lengths):
    """c_out=64 carried in 128-lane buffers (upper half zero): the layout
    the half-resolution C=64 blocks use so no parity packing or lane
    slicing happens between kernels."""
    from arttts_tpu.ops.resblock2d_pallas import (
        pack_resblock_params_wide,
        pad_wide,
        resblock2d_wide,
        unpad_wide,
    )

    c_in = sum(c_chunks)
    rng = np.random.default_rng(c_in + H)
    x, mask, temb = _inputs(rng, B, H, T, c_in, lengths)

    mod = ResnetBlock2d(dim_out=64, masked_norm=True)
    variables = mod.init(jax.random.PRNGKey(0), x, mask, temb)
    ref = mod.apply(variables, x, mask, temb)

    p = variables["params"]
    params = pack_resblock_params_wide(p, c_chunks, 64, real64=True)
    tv = jnp.tanh(jax.nn.softplus(temb)) * temb
    tv = tv @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]  # (B, 64)
    tv = jnp.pad(tv, ((0, 0), (0, 64)))  # padded lanes

    offs = np.cumsum((0,) + c_chunks)
    xs = []
    for j in range(len(c_chunks)):
        chunk = x[..., offs[j] : offs[j + 1]]
        if chunk.shape[-1] == 64:  # real64 buffer: zero upper half
            chunk = jnp.pad(chunk, ((0, 0),) * 3 + ((0, 64),))
        xs.append(pad_wide(chunk))
    lens = jnp.asarray(lengths, jnp.int32)

    out = resblock2d_wide(
        tuple(xs), lens, tv, params, c_out=64, c_chunks=c_chunks,
        interpret=True, bf16=False, real64=True,
    )
    got = unpad_wide(out)
    # upper lanes must be exactly zero (downstream kernels rely on it)
    np.testing.assert_array_equal(np.asarray(got[..., 64:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(got[..., :64]), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
