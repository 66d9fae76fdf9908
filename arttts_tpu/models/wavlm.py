"""WavLM encoder (flax) — the SSL backbone of the SPARC articulatory coder.

The reference consumes SPARC (`speech-articulatory-coding`) as an opaque
external package (`/root/reference/src/encode_audio_voxcom.py:1,66-70`,
`data.py:150`): `coder.encode(wav)` returns 12 EMA channels + pitch +
loudness and a 1024-d speaker pre-embedding.  SPARC's acoustic-to-
articulatory inversion is a linear probe on an intermediate layer of
WavLM-Large (Cho et al., Interspeech 2024), so a framework-native encoder
needs WavLM itself.  This module implements the WavLM architecture natively:

  raw wav -> strided conv feature extractor (512 ch) -> LayerNorm ->
  Linear -> + grouped positional conv -> N transformer layers with
  *gated relative position bias* attention (T5-style log-bucketed bias,
  per-position sigmoid gates) -> hidden states.

Both encoder variants are supported: pre-LN ("stable layer norm", used by
WavLM-Large) and post-LN (WavLM-Base), and both conv-extractor norm modes
("layer" per-conv LayerNorm for Large, single GroupNorm for Base).
Correctness is golden-tested against `transformers.WavLMModel` on random
weights (`tests/test_wavlm.py`); the HF->flax converter lives in
`arttts_tpu/utils/torch_convert_wavlm.py`.

TPU notes: everything is MXU-friendly dense/conv work on static bucketed
shapes; the relative-position bucket matrix is a trace-time numpy constant
(static T), so no gathers appear on device.  `tap_layer` stops the
transformer stack early — SPARC reads layer 9 of 24, so inversion skips
~60% of the FLOPs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    hidden_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    num_buckets: int = 320
    max_distance: int = 800
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # WavLM-Large: pre-LN blocks, per-conv LayerNorm, conv bias.
    stable_layer_norm: bool = True
    conv_norm: str = "layer"  # "layer" (Large) | "group" (Base)
    conv_bias: bool = True
    layer_norm_eps: float = 1e-5

    @staticmethod
    def large() -> "WavLMConfig":
        return WavLMConfig()

    @staticmethod
    def base() -> "WavLMConfig":
        return WavLMConfig(
            hidden_dim=768,
            num_layers=12,
            num_heads=12,
            ffn_dim=3072,
            stable_layer_norm=False,
            conv_norm="group",
            conv_bias=False,
        )


def relative_position_buckets(
    length: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """(T, T) int32 bucket ids for the T5-style log-spaced relative-position
    embedding (sign split, exact small offsets, log-compressed large ones).
    Pure numpy on a static length: becomes a compile-time constant."""
    half = num_buckets // 2
    rel = np.arange(length)[None, :] - np.arange(length)[:, None]  # mem - ctx
    out = np.where(rel > 0, half, 0).astype(np.int64)
    mag = np.abs(rel)
    max_exact = half // 2
    with np.errstate(divide="ignore"):
        log_pos = max_exact + (
            np.log(np.maximum(mag, 1) / max_exact)
            / math.log(max_distance / max_exact)
            * (half - max_exact)
        ).astype(np.int64)
    out += np.where(mag < max_exact, mag, np.minimum(log_pos, half - 1))
    return out.astype(np.int32)


class ConvFeatureExtractor(nn.Module):
    """Strided conv stack over raw audio -> (B, frames, 512)."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, wav):
        c = self.config
        x = wav[:, :, None]
        for i, (dim, k, stride) in enumerate(c.conv_layers):
            x = nn.Conv(
                dim,
                (k,),
                strides=(stride,),
                padding="VALID",
                use_bias=c.conv_bias,
                name=f"conv_{i}",
            )(x)
            if c.conv_norm == "layer":
                x = nn.LayerNorm(epsilon=c.layer_norm_eps, name=f"conv_ln_{i}")(x)
            elif i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=c.layer_norm_eps, name="group_norm"
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class PosConv(nn.Module):
    """Grouped positional convolution (kernel 128, groups 16); the torch
    weight norm is folded into a plain kernel at conversion time. An even
    kernel with SAME-style padding produces one extra frame which is
    dropped (torch WavLMSamePadLayer)."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        k = c.pos_conv_kernel
        h = nn.Conv(
            x.shape[-1],
            (k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=c.pos_conv_groups,
            name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class GatedRelPosAttention(nn.Module):
    """WavLM self-attention: scores = q.k/sqrt(d) + gate(x) * rel_bias.

    The bias is a per-head embedding of log-bucketed relative positions
    (shared across layers, owned by layer 0); each layer modulates it with
    per-position sigmoid gates computed from its own hidden states."""

    config: WavLMConfig
    has_rel_embed: bool

    @nn.compact
    def __call__(self, x, pos_bias, key_mask):
        c = self.config
        B, T, D = x.shape
        H = c.num_heads
        dh = D // H

        if pos_bias is None:
            buckets = jnp.asarray(
                relative_position_buckets(T, c.num_buckets, c.max_distance)
            )
            embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (c.num_buckets, H),
            )
            pos_bias = jnp.transpose(embed[buckets], (2, 0, 1))  # (H, T, T)

        q = nn.Dense(D, name="q_proj")(x).reshape(B, T, H, dh)
        k = nn.Dense(D, name="k_proj")(x).reshape(B, T, H, dh)
        v = nn.Dense(D, name="v_proj")(x).reshape(B, T, H, dh)

        # per-position gate: x -> heads -> Linear(dh, 8) -> (2, 4).sum -> sigmoid
        gp = nn.Dense(8, name="gate_proj")(x.reshape(B, T, H, dh))
        gp = gp.reshape(B, T, H, 2, 4).sum(-1)
        gates = nn.sigmoid(gp)  # (B, T, H, 2)
        g_const = self.param("gate_const", nn.initializers.ones, (H,))
        gate = gates[..., 0] * (gates[..., 1] * g_const - 1.0) + 2.0  # (B, T, H)
        gated_bias = (
            jnp.transpose(gate, (0, 2, 1))[:, :, :, None] * pos_bias[None]
        )  # (B, H, Tq, Tk)

        scores = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh) + gated_bias
        )
        if key_mask is not None:
            scores = jnp.where(
                key_mask[:, None, None, :], scores, jnp.finfo(scores.dtype).min
            )
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out), pos_bias


class WavLMLayer(nn.Module):
    config: WavLMConfig
    has_rel_embed: bool

    @nn.compact
    def __call__(self, x, pos_bias, key_mask):
        c = self.config
        attn = GatedRelPosAttention(c, self.has_rel_embed, name="attention")
        ln1 = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")
        ln2 = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")

        def ffn(h):
            h = nn.Dense(c.ffn_dim, name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(c.hidden_dim, name="fc2")(h)

        if c.stable_layer_norm:  # pre-LN (Large)
            a, pos_bias = attn(ln1(x), pos_bias, key_mask)
            x = x + a
            x = x + ffn(ln2(x))
        else:  # post-LN (Base)
            a, pos_bias = attn(x, pos_bias, key_mask)
            x = ln1(x + a)
            x = ln2(x + ffn(x))
        return x, pos_bias


class WavLMEncoder(nn.Module):
    """Full WavLM: wav (B, T_samples) -> hidden states (B, frames, D).

    `tap_layer=i` returns the residual stream *entering* transformer layer i
    (HF `hidden_states[i]` convention) and skips layers i..N — the SPARC
    inversion probe reads layer 9 of 24. `tap_layer=None` runs the full
    stack and applies the final LayerNorm (stable variant only), matching
    `WavLMModel(...).last_hidden_state`.
    """

    config: WavLMConfig = WavLMConfig()

    @nn.compact
    def __call__(
        self,
        wav,
        frame_mask: Optional[jnp.ndarray] = None,
        tap_layer: Optional[int] = None,
    ):
        c = self.config
        feats = ConvFeatureExtractor(c, name="feature_extractor")(wav)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="feature_norm")(feats)
        h = nn.Dense(c.hidden_dim, name="feature_projection")(h)

        if frame_mask is not None:
            h = h * frame_mask[:, :, None].astype(h.dtype)
        h = h + PosConv(c, name="pos_conv")(h)
        if not c.stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_norm")(h)

        key_mask = None if frame_mask is None else frame_mask.astype(bool)
        n_run = c.num_layers if tap_layer is None else tap_layer
        pos_bias = None
        for i in range(n_run):
            h, pos_bias = WavLMLayer(c, i == 0, name=f"layer_{i}")(
                h, pos_bias, key_mask
            )
        if tap_layer is None and c.stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_norm")(h)
        return h

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for _, k, s in self.config.conv_layers:
            n = (n - k) // s + 1
        return n
