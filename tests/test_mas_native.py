"""C++ and Pallas MAS backends vs the NumPy golden oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.ops.mas import mas_reference_numpy
from tests.test_mas import _random_problem


def test_mas_cpp_matches_golden(rng):
    from arttts_tpu.ops.mas_cpp import mas_cpp

    for (B, T_x, T_y) in [(2, 5, 11), (4, 17, 41), (3, 33, 96)]:
        value, t_xs, t_ys = _random_problem(rng, B, T_x, T_y)
        golden = mas_reference_numpy(value, t_xs, t_ys)
        got = mas_cpp(value, t_xs, t_ys)
        np.testing.assert_array_equal(got, golden)


def test_mas_pallas_interpret_matches_golden(rng):
    from arttts_tpu.ops.mas_pallas import mas_pallas

    for (B, T_x, T_y) in [(2, 8, 16), (3, 17, 41)]:
        value, t_xs, t_ys = _random_problem(rng, B, T_x, T_y)
        golden = mas_reference_numpy(value, t_xs, t_ys)
        got = np.asarray(
            mas_pallas(
                jnp.asarray(value),
                jnp.asarray(t_xs),
                jnp.asarray(t_ys),
                interpret=True,
            )
        )
        np.testing.assert_array_equal(got.astype(np.int32), golden)
