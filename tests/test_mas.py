"""MAS kernel unit tests: lax.scan implementation vs the NumPy golden DP
(which transcribes the reference Cython semantics at core.pyx:9-45)."""

import jax.numpy as jnp
import numpy as np

from arttts_tpu.ops.mas import mas_reference_numpy, mas_scan, maximum_path
from arttts_tpu.ops.shape import sequence_mask


def _random_problem(rng, B=4, T_x=17, T_y=41):
    value = rng.standard_normal((B, T_x, T_y)).astype(np.float32)
    t_xs = rng.integers(min(2, T_x), T_x + 1, size=B).astype(np.int32)
    t_ys = np.array(
        [rng.integers(t_x, T_y + 1) for t_x in t_xs], dtype=np.int32
    )  # alignment needs t_y >= t_x
    # mask out padding like the reference wrapper does (value * mask)
    for i in range(B):
        value[i, t_xs[i]:, :] = 0.0
        value[i, :, t_ys[i]:] = 0.0
    return value, t_xs, t_ys


def test_mas_matches_numpy_golden(rng):
    value, t_xs, t_ys = _random_problem(rng)
    golden = mas_reference_numpy(value, t_xs, t_ys)
    got = np.asarray(mas_scan(jnp.asarray(value), jnp.asarray(t_xs), jnp.asarray(t_ys)))
    np.testing.assert_array_equal(got.astype(np.int32), golden)


def test_mas_matches_golden_many_shapes(rng):
    for (B, T_x, T_y) in [(1, 1, 1), (2, 3, 3), (3, 8, 64), (2, 40, 40), (5, 13, 29)]:
        value, t_xs, t_ys = _random_problem(rng, B, T_x, T_y)
        golden = mas_reference_numpy(value, t_xs, t_ys)
        got = np.asarray(
            mas_scan(jnp.asarray(value), jnp.asarray(t_xs), jnp.asarray(t_ys))
        )
        np.testing.assert_array_equal(got.astype(np.int32), golden)


def test_mas_path_properties(rng):
    value, t_xs, t_ys = _random_problem(rng, B=3, T_x=11, T_y=37)
    path = np.asarray(
        mas_scan(jnp.asarray(value), jnp.asarray(t_xs), jnp.asarray(t_ys))
    )
    for i in range(3):
        p = path[i, : t_xs[i], : t_ys[i]]
        # each frame is assigned exactly one token
        np.testing.assert_array_equal(p.sum(axis=0), np.ones(t_ys[i]))
        # durations are positive and sum to t_y
        durations = p.sum(axis=1)
        assert (durations >= 1).all()
        assert durations.sum() == t_ys[i]
        # monotonic: token index is non-decreasing over frames
        token_of_frame = p.argmax(axis=0)
        assert (np.diff(token_of_frame) >= 0).all()
        # padding is zero
        assert path[i, t_xs[i]:, :].sum() == 0
        assert path[i, :, t_ys[i]:].sum() == 0


def test_maximum_path_wrapper(rng):
    B, T_x, T_y = 3, 9, 25
    value = rng.standard_normal((B, T_x, T_y)).astype(np.float32)
    t_xs = np.array([9, 5, 7], dtype=np.int32)
    t_ys = np.array([25, 18, 7], dtype=np.int32)
    x_mask = np.asarray(sequence_mask(jnp.asarray(t_xs), T_x), np.float32)
    y_mask = np.asarray(sequence_mask(jnp.asarray(t_ys), T_y), np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    golden = mas_reference_numpy(value * mask, t_xs, t_ys)
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(got.astype(np.int32), golden)
