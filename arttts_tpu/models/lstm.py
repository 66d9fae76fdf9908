"""Bidirectional LSTM with torch-compatible parameterization.

UTMOS's LDConditioner runs a single-layer BiLSTM over SSL frames
(`/root/reference/UTMOS-demo/model.py:111-164`). TPU-native implementation:
the input projections for the whole sequence are one big batched matmul
(MXU), and only the tiny recurrent matmul rides in the `lax.scan` carry.
Weights are stored in the torch layout (w_ih (4H, I), w_hh (4H, H), two bias
vectors, gate order i, f, g, o) so checkpoint conversion is a plain copy.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(x_proj, w_hh, b, hidden_size: int, reverse: bool = False):
    """x_proj: (B, T, 4H) precomputed input projections (+ biases)."""

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh.T  # (B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    B = x_proj.shape[0]
    init = (
        jnp.zeros((B, hidden_size), x_proj.dtype),
        jnp.zeros((B, hidden_size), x_proj.dtype),
    )
    xs = jnp.swapaxes(x_proj + b, 0, 1)  # (T, B, 4H)
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


class BiLSTM(nn.Module):
    """Single-layer bidirectional LSTM, outputs concat([fwd, bwd], -1)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        H, I = self.hidden_size, self.input_size
        init = nn.initializers.uniform(scale=2.0 / jnp.sqrt(H))

        def direction(suffix: str, reverse: bool):
            w_ih = self.param(f"weight_ih{suffix}", init, (4 * H, I))
            w_hh = self.param(f"weight_hh{suffix}", init, (4 * H, H))
            b_ih = self.param(f"bias_ih{suffix}", nn.initializers.zeros, (4 * H,))
            b_hh = self.param(f"bias_hh{suffix}", nn.initializers.zeros, (4 * H,))
            x_proj = x @ w_ih.T  # one big MXU matmul over the whole sequence
            return _lstm_scan(x_proj, w_hh, b_ih + b_hh, H, reverse=reverse)

        fwd = direction("_l0", False)
        bwd = direction("_l0_reverse", True)
        return jnp.concatenate([fwd, bwd], axis=-1)
