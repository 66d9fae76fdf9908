"""HuggingFace WavLM checkpoint -> flax params for `arttts_tpu.models.wavlm`.

SPARC's articulatory inversion is a linear probe over WavLM-Large features
(the reference consumes it through the opaque `sparc` package —
`/root/reference/src/encode_audio_voxcom.py:66-70`).  This converter maps a
`transformers.WavLMModel` state dict (the public microsoft/wavlm-* weights,
which the sparc checkpoints embed) onto the native encoder; golden-tested
on random weights in `tests/test_wavlm.py`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from arttts_tpu.models.wavlm import WavLMConfig
from arttts_tpu.utils.torch_convert import _np


def _dense(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _conv1d_kernel(w):
    return np.transpose(_np(w), (2, 1, 0))  # (out, in, k) -> (k, in, out)


def _fold_parametrized_weight_norm(sd: Dict) -> Dict:
    """torch >= 2.1 stores weight_norm as parametrizations.weight.original{0,1}."""
    out = dict(sd)
    for k in list(out):
        if k.endswith("parametrizations.weight.original0"):
            base = k[: -len("parametrizations.weight.original0")]
            g = _np(out[k])
            v = _np(out[base + "parametrizations.weight.original1"])
            norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
            out[base + "weight"] = g * v / norm
        elif k.endswith(".weight_g"):
            base = k[: -len("weight_g")]
            g, v = _np(out[k]), _np(out[base + "weight_v"])
            norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
            out[base + "weight"] = g * v / norm
    return out


def convert_wavlm(state_dict: Dict, config: WavLMConfig) -> Dict:
    """`transformers.WavLMModel.state_dict()` -> params for `WavLMEncoder`.

    Accepts both bare-model keys (`feature_extractor...`) and `wavlm.`-
    prefixed ones.
    """
    sd = _fold_parametrized_weight_norm(
        {k.removeprefix("wavlm."): v for k, v in state_dict.items()}
    )

    fe: Dict = {}
    for i in range(len(config.conv_layers)):
        conv = {"kernel": _conv1d_kernel(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])}
        if config.conv_bias:
            conv["bias"] = _np(sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        fe[f"conv_{i}"] = conv
        if config.conv_norm == "layer":
            fe[f"conv_ln_{i}"] = _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
        elif i == 0:
            fe["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")

    params: Dict = {
        "feature_extractor": fe,
        "feature_norm": _ln(sd, "feature_projection.layer_norm"),
        "feature_projection": _dense(sd, "feature_projection.projection"),
        "pos_conv": {
            "conv": {
                "kernel": _conv1d_kernel(sd["encoder.pos_conv_embed.conv.weight"]),
                "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
            }
        },
        "encoder_norm": _ln(sd, "encoder.layer_norm"),
    }

    for i in range(config.num_layers):
        lp = f"encoder.layers.{i}"
        attn = {
            "q_proj": _dense(sd, f"{lp}.attention.q_proj"),
            "k_proj": _dense(sd, f"{lp}.attention.k_proj"),
            "v_proj": _dense(sd, f"{lp}.attention.v_proj"),
            "out_proj": _dense(sd, f"{lp}.attention.out_proj"),
            "gate_proj": _dense(sd, f"{lp}.attention.gru_rel_pos_linear"),
            "gate_const": _np(sd[f"{lp}.attention.gru_rel_pos_const"]).reshape(-1),
        }
        if i == 0:
            attn["rel_attn_embed"] = _np(sd[f"{lp}.attention.rel_attn_embed.weight"])
        params[f"layer_{i}"] = {
            "attention": attn,
            "layer_norm": _ln(sd, f"{lp}.layer_norm"),
            "final_layer_norm": _ln(sd, f"{lp}.final_layer_norm"),
            "fc1": _dense(sd, f"{lp}.feed_forward.intermediate_dense"),
            "fc2": _dense(sd, f"{lp}.feed_forward.output_dense"),
        }
    return params
