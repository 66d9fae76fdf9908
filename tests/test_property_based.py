"""Property-based fuzzing (hypothesis) of the exactness-critical kernels."""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from arttts_tpu.ops.mas import mas_reference_numpy, mas_scan
from arttts_tpu.ops.shape import fix_len_compatibility, generate_path, sequence_mask


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 4),   # B
    st.integers(1, 24),  # T_x
    st.integers(0, 40),  # extra frames beyond T_x
    st.integers(0, 2**31 - 1),
)
def test_mas_scan_matches_oracle_fuzz(B, T_x, extra, seed):
    T_y = T_x + extra
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((B, T_x, T_y)).astype(np.float32) * 3
    t_xs = rng.integers(1, T_x + 1, size=B).astype(np.int32)
    t_ys = np.array([rng.integers(t, T_y + 1) for t in t_xs], dtype=np.int32)
    for i in range(B):
        value[i, t_xs[i] :, :] = 0
        value[i, :, t_ys[i] :] = 0
    golden = mas_reference_numpy(value, t_xs, t_ys)
    got = np.asarray(
        mas_scan(jnp.asarray(value), jnp.asarray(t_xs), jnp.asarray(t_ys))
    )
    np.testing.assert_array_equal(got.astype(np.int32), golden)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 3), st.integers(1, 12), st.integers(0, 2**31 - 1))
@pytest.mark.slow
def test_generate_path_partitions_frames(B, T_x, seed):
    rng = np.random.default_rng(seed)
    durations = rng.integers(1, 5, size=(B, T_x)).astype(np.float32)
    t_ys = durations.sum(axis=1).astype(np.int32)
    T_y = int(t_ys.max())
    x_mask = np.ones((B, T_x), np.float32)
    y_mask = np.asarray(sequence_mask(jnp.asarray(t_ys), T_y), np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    path = np.asarray(generate_path(jnp.asarray(durations), jnp.asarray(mask)))
    for b in range(B):
        valid = path[b, :, : t_ys[b]]
        # every frame covered exactly once; rows recover the durations
        np.testing.assert_array_equal(valid.sum(axis=0), np.ones(t_ys[b]))
        np.testing.assert_array_equal(valid.sum(axis=1), durations[b])


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 4000), st.integers(1, 4))
def test_fix_len_compatibility_properties(n, pows):
    out = fix_len_compatibility(n, pows)
    assert out >= n
    assert out % (2**pows) == 0
    assert out - n < 2**pows
