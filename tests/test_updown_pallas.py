"""Interpret-mode parity of the resolution-change kernels
(`ops/updown_pallas.py`) against the flax modules: stride-2 downsample
(packed -> real64) and 4x4 stride-2 ConvTranspose (real64 -> packed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.convs import ConvTranspose2dTorch
from arttts_tpu.models.unet2d import Downsample2d
from arttts_tpu.ops.resblock2d_pallas import (
    pack_image,
    pad_wide,
    unpack_image,
    unpad_wide,
)
from arttts_tpu.ops.updown_pallas import (
    conv_transpose2d_from_real64,
    downsample2d_to_real64,
    pack_convt_params,
    pack_downsample_params,
)


@pytest.mark.parametrize("B,T,lengths", [(1, 128, [128]), (2, 128, [128, 77])])
def test_downsample_parity(B, T, lengths):
    H, C = 80, 64
    rng = np.random.default_rng(T + B)
    x = jnp.asarray(rng.standard_normal((B, H, T, C)).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(T)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32)[:, None, :, None]
    )

    mod = Downsample2d(C)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x * mask)  # (B, H/2, T/2, C)

    params = pack_downsample_params(variables["params"])
    out = downsample2d_to_real64(
        pack_image(x),
        jnp.asarray(lengths, jnp.int32),
        params,
        interpret=True,
        bf16=False,
    )
    got = unpad_wide(out)
    np.testing.assert_array_equal(np.asarray(got[..., 64:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(got[..., :64]), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("B,T,lengths", [(1, 128, [128]), (2, 128, [128, 90])])
def test_convt_parity(B, T, lengths):
    H2, C, T2 = 40, 64, T // 2
    lengths2 = [(l + 1) // 2 for l in lengths]
    rng = np.random.default_rng(T + B + 1)
    x = jnp.asarray(rng.standard_normal((B, H2, T2, C)).astype(np.float32))
    m2 = jnp.asarray(
        (np.arange(T2)[None, :] < np.asarray(lengths2)[:, None])
        .astype(np.float32)[:, None, :, None]
    )

    mod = ConvTranspose2dTorch(C, C, 4, 2, 1)
    variables = mod.init(jax.random.PRNGKey(1), x)
    ref = mod.apply(variables, x * m2)  # (B, H, T, C)

    # real64 buffer: channels in the low half, zero upper, padded frames
    xr = jnp.pad(x * m2, ((0, 0),) * 3 + ((0, 64),))
    out = conv_transpose2d_from_real64(
        pad_wide(xr),
        jnp.asarray(lengths, jnp.int32),
        pack_convt_params(variables["params"]),
        interpret=True,
        bf16=False,
    )
    got = unpack_image(out)  # (B, H, T, 64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize(
    "B,T2,lengths2", [(1, 128, [128]), (2, 128, [128, 77])]
)
def test_downsample_wide_parity(B, T2, lengths2):
    """`downsample2d_wide` (C=128 mid boundary) vs the flax module."""
    from arttts_tpu.ops.updown_pallas import (
        downsample2d_wide,
        pack_downsample_wide_params,
    )

    H, C = 40, 128
    rng = np.random.default_rng(T2 + B + 7)
    x = jnp.asarray(rng.standard_normal((B, H, T2, C)).astype(np.float32))
    m2 = jnp.asarray(
        (np.arange(T2)[None, :] < np.asarray(lengths2)[:, None])
        .astype(np.float32)[:, None, :, None]
    )

    mod = Downsample2d(C)
    variables = mod.init(jax.random.PRNGKey(3), x)
    ref = mod.apply(variables, x * m2)  # (B, H/2, T2/2, C)

    out = downsample2d_wide(
        pad_wide(x),
        jnp.asarray(lengths2, jnp.int32),
        pack_downsample_wide_params(variables["params"]),
        interpret=True,
        bf16=False,
    )
    got = unpad_wide(out)
    # bias is added everywhere; compare only valid output frames (consumers
    # mask exactly like after the XLA module path)
    T4 = T2 // 2
    lengths4 = [(l + 1) // 2 for l in lengths2]
    m4 = (np.arange(T4)[None, :] < np.asarray(lengths4)[:, None]).astype(
        np.float32
    )[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * m4, np.asarray(ref) * m4, atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize(
    "B,T4,lengths4", [(1, 64, [64]), (2, 64, [64, 39])]
)
def test_convt_wide_parity(B, T4, lengths4):
    """`conv_transpose2d_wide` (C=128 mid boundary) vs the flax module."""
    from arttts_tpu.ops.updown_pallas import (
        conv_transpose2d_wide,
        pack_convt_wide_params,
    )

    H2, C = 20, 128
    rng = np.random.default_rng(T4 + B + 11)
    x = jnp.asarray(rng.standard_normal((B, H2, T4, C)).astype(np.float32))
    m4 = jnp.asarray(
        (np.arange(T4)[None, :] < np.asarray(lengths4)[:, None])
        .astype(np.float32)[:, None, :, None]
    )

    mod = ConvTranspose2dTorch(C, C, 4, 2, 1)
    variables = mod.init(jax.random.PRNGKey(4), x)
    ref = mod.apply(variables, x * m4)  # (B, 2*H2, 2*T4, C)

    out = conv_transpose2d_wide(
        pad_wide(x),
        jnp.asarray(lengths4, jnp.int32),
        pack_convt_wide_params(variables["params"]),
        interpret=True,
        bf16=False,
    )
    got = unpad_wide(out)
    T2 = 2 * T4
    lengths2 = [2 * l for l in lengths4]
    m2 = (np.arange(T2)[None, :] < np.asarray(lengths2)[:, None]).astype(
        np.float32
    )[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * m2, np.asarray(ref) * m2, atol=2e-4, rtol=2e-4
    )
