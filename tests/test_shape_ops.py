"""Tests for shape utilities vs reference semantics (model/utils.py)."""

import jax.numpy as jnp
import numpy as np

from arttts_tpu.ops.shape import (
    duration_loss,
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.array([0, 2, 5]), 5))
    expected = np.array(
        [[0, 0, 0, 0, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], dtype=bool
    )
    np.testing.assert_array_equal(m, expected)


def test_fix_len_compatibility():
    assert fix_len_compatibility(100) == 100
    assert fix_len_compatibility(101) == 104
    assert fix_len_compatibility(1) == 4
    assert fix_len_compatibility(4) == 4
    assert fix_len_compatibility(7, 3) == 8


def test_generate_path_simple():
    durations = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    path = np.asarray(generate_path(durations, mask))
    expected = np.array(
        [[[1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]]],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(path[0], expected[0])


def test_generate_path_respects_mask(rng):
    B, T_x, T_y = 3, 5, 12
    durations = jnp.asarray(rng.integers(1, 4, size=(B, T_x)).astype(np.float32))
    x_mask = sequence_mask(jnp.array([5, 3, 4]), T_x).astype(jnp.float32)
    y_len = np.asarray(durations).sum(axis=1).astype(np.int32)
    y_mask = sequence_mask(jnp.asarray(y_len), T_y).astype(jnp.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    path = np.asarray(generate_path(durations, mask))
    assert ((path == 0) | (path == 1)).all()
    assert (path * (1 - np.asarray(mask)) == 0).all()


def test_duration_loss():
    logw = jnp.array([[1.0, 2.0]])
    logw_hat = jnp.array([[0.0, 0.0]])
    lengths = jnp.array([2.0])
    assert float(duration_loss(logw, logw_hat, lengths)) == 2.5
