"""Convolution helpers with torch-compatible transposed-conv semantics.

JAX's `conv_transpose` and torch's `ConvTranspose{1,2}d` differ in kernel
orientation and padding bookkeeping. Vocoder weight conversion (HiFi-GAN
`ConvTranspose1d(k, s, p)` — `hifi-gan/models.py:159-170`,
`model_ms/sparc_generator.py:76-109`) needs exact torch semantics, so this
module implements transposed conv as an input-dilated regular conv with a
flipped kernel, which is bit-equivalent to torch's definition:

    out = (in - 1) * stride - 2 * padding + kernel + output_padding
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def conv_transpose_1d(
    x, w, stride: int, padding: int, output_padding: int = 0,
    polyphase: bool = False,
):
    """x: (B, T, Cin); w torch-layout (Cin, Cout, K) -> (B, T_out, Cout).

    `polyphase=True` rewrites the K == 2*stride case (every HiFi-GAN
    upsampling stage) as a 2-tap matmul producing all `stride` phases at
    once plus a subpixel interleave — float-exact vs torch (see
    `_conv_transpose_1d_polyphase`).  Measured on TPU v5e it LOSES to XLA's
    lhs-dilated lowering for the HiFi-GAN stages (24.8 ms vs 16.3 ms for the
    full vocoder): the (T, stride*Cout) -> (T*stride, Cout) interleave
    materializes lane-padded small-channel tensors (Cout 32..128 pads to
    128 lanes), which costs more than the dilation saves.  Kept opt-in for
    configurations with Cout >= 128.
    """
    k = w.shape[-1]
    if polyphase and k == 2 * stride and stride > 1:
        return _conv_transpose_1d_polyphase(x, w, stride, padding, output_padding)
    w_flip = jnp.flip(w, axis=-1)
    w_hio = jnp.transpose(w_flip, (2, 0, 1))  # (K, Cin, Cout)
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    return lax.conv_general_dilated(
        x,
        w_hio,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _conv_transpose_1d_polyphase(
    x, w, stride: int, padding: int, output_padding: int = 0
):
    """Exact K==2*stride transposed conv as 2-tap matmul + subpixel reshape.

    Derivation: out[n] = sum_{t,j: n = t*stride - padding + j} x[t] @ w[..., j].
    With u = n + padding, t0 = floor(u/s), r = u mod s, only j = r (t = t0)
    and j = r + s (t = t0 - 1) hit the kernel, so
        out[n] = x[t0] @ w[..., r] + x[t0 - 1] @ w[..., r + s].
    Stacking phases r = 0..s-1 gives y[t] = [x[t-1], x[t]] @ W2 with
    W2 (2*Cin, s*Cout); flattening (t, r) recovers the output after slicing
    off the first `padding` and trailing overhang samples.
    """
    B, T, Cin = x.shape
    Cout = w.shape[1]
    s = stride
    # the final slice reads y[padding : padding + out_len] from (T+1)*s
    # frames; output_padding > padding would run past the buffer
    assert output_padding <= padding, (
        f"polyphase path requires output_padding ({output_padding}) <= "
        f"padding ({padding}); use the lhs-dilated path"
    )
    out_len = (T - 1) * s - 2 * padding + w.shape[-1] + output_padding
    # W2[0] takes x[t-1] (taps s..2s-1), W2[1] takes x[t] (taps 0..s-1)
    w2 = jnp.stack([w[..., s : 2 * s], w[..., 0:s]], axis=0)  # (2, Cin, Cout, s)
    w2 = jnp.transpose(w2, (0, 1, 3, 2)).reshape(2 * Cin, s * Cout)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))  # x[-1] = x[T] = 0
    pairs = jnp.concatenate([x_pad[:, :-1, :], x_pad[:, 1:, :]], axis=-1)
    y = pairs @ w2  # (B, T + 1, s*Cout)
    y = y.reshape(B, (T + 1) * s, Cout)
    return lax.slice_in_dim(y, padding, padding + out_len, axis=1)


def conv_transpose_2d(x, w, stride: int, padding: int, output_padding: int = 0):
    """x: (B, H, W, Cin); w torch-layout (Cin, Cout, Kh, Kw)."""
    kh, kw = w.shape[-2:]
    w_flip = jnp.flip(w, axis=(-2, -1))
    w_hwio = jnp.transpose(w_flip, (2, 3, 0, 1))  # (Kh, Kw, Cin, Cout)
    pads = [
        (kh - 1 - padding, kh - 1 - padding + output_padding),
        (kw - 1 - padding, kw - 1 - padding + output_padding),
    ]
    return lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvTranspose1dTorch(nn.Module):
    """Torch-semantics ConvTranspose1d with torch-layout weights for direct
    checkpoint conversion."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(in_axis=0, out_axis=1),
            (self.in_channels, self.out_channels, self.kernel_size),
        )
        y = conv_transpose_1d(x, w, self.stride, self.padding, self.output_padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b
        return y


class ConvTranspose2dTorch(nn.Module):
    """Torch-semantics ConvTranspose2d (used by the U-Net Upsample,
    diffusion.py:21-27)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(in_axis=0, out_axis=1),
            (self.in_channels, self.out_channels, self.kernel_size, self.kernel_size),
        )
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
        y = conv_transpose_2d(x, w, self.stride, self.padding, self.output_padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + (b.astype(self.dtype) if self.dtype is not None else b)
        return y
