"""Packed polyphase upsample kernel vs lrelu + torch-exact ConvTranspose1d
(interpret mode). Covers both chained stage shapes and sequence edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.convs import conv_transpose_1d
from arttts_tpu.ops.upsample_pallas import upsample_packed


def _pack(x, r):
    B, T, C = x.shape
    return x.reshape(B, T // r, r * C)


def _unpack(x, r, C):
    B, rows, _ = x.shape
    return x.reshape(B, rows * r, C)


@pytest.mark.parametrize(
    "cin,cout,T",
    [(128, 64, 1024), (64, 32, 2048)],
    ids=["stage3", "stage4"],
)
def test_upsample_packed_matches_reference(rng, cin, cout, T):
    s, k, p = 2, 4, 1
    r_in, r_out = 128 // cin, 128 // cout
    x = rng.standard_normal((2, T, cin)).astype(np.float32)
    w = (rng.standard_normal((cin, cout, k)) * 0.1).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)

    xl = jnp.where(jnp.asarray(x) >= 0, jnp.asarray(x), 0.1 * jnp.asarray(x))
    want = np.asarray(
        conv_transpose_1d(xl, jnp.asarray(w), s, p) + jnp.asarray(b)
    )  # (2, T*s, cout)

    got_packed = upsample_packed(
        _pack(jnp.asarray(x), r_in), jnp.asarray(w), jnp.asarray(b),
        s, p, r_in=r_in, r_out=r_out, interpret=True,
    )
    got = np.asarray(_unpack(got_packed, r_out, cout))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_upsample_packed_tile_seams(rng):
    """Rows > one tile: halo DMA correctness across tile boundaries."""
    cin, cout, T = 64, 32, 4096 * 4  # rows = 8192 > tile 2048
    s, k, p = 2, 4, 1
    r_in, r_out = 2, 4
    x = rng.standard_normal((1, T, cin)).astype(np.float32)
    w = (rng.standard_normal((cin, cout, k)) * 0.1).astype(np.float32)
    b = np.zeros((cout,), np.float32)
    xl = jnp.where(jnp.asarray(x) >= 0, jnp.asarray(x), 0.1 * jnp.asarray(x))
    want = np.asarray(conv_transpose_1d(xl, jnp.asarray(w), s, p))
    got = np.asarray(
        _unpack(
            upsample_packed(
                _pack(jnp.asarray(x), r_in), jnp.asarray(w), jnp.asarray(b),
                s, p, r_in=r_in, r_out=r_out, interpret=True,
            ),
            r_out, cout,
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_upsample_packed_batch_sharded(rng):
    """Under an 8-device data mesh the packed upsample partitions per batch
    shard (custom_partitioning rule) and matches the unsharded result."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from arttts_tpu.ops.upsample_pallas import upsample_packed

    cin, cout, stride = 128, 64, 2
    w = jnp.asarray(
        rng.standard_normal((cin, cout, 2 * stride)).astype(np.float32) * 0.2
    )
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 256, 128)).astype(np.float32))
    want = np.asarray(
        upsample_packed(x, w, bias, stride, 1, r_in=1, r_out=2, interpret=True)
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got = np.asarray(
        upsample_packed(xs, w, bias, stride, 1, r_in=1, r_out=2, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
