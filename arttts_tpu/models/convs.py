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


def conv_transpose_1d(x, w, stride: int, padding: int, output_padding: int = 0):
    """x: (B, T, Cin); w torch-layout (Cin, Cout, K) -> (B, T_out, Cout)."""
    k = w.shape[-1]
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
