"""Converters: fairseq / HuggingFace wav2vec2 + UTMOS lightning checkpoints
-> flax param trees for `arttts_tpu.models.wav2vec2` / `models.utmos`.

The UTMOS checkpoint (`score.py:24`) stores the fairseq wav2vec2-small under
`feature_extractors.0.ssl_model.*` plus the head weights under
`feature_extractors.1.*` / `output_layers.*`; HF naming is supported for
golden tests against `transformers.Wav2Vec2Model`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from arttts_tpu.utils.torch_convert import _np, fold_weight_norm


def _dense(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _conv1d_kernel(w):
    return np.transpose(_np(w), (2, 1, 0))  # (out,in,k) -> (k,in,out)


def _attention(sd, prefix, num_heads):
    """torch {q,k,v,out}_proj -> flax MultiHeadDotProductAttention params."""
    out = {}
    W_q = _np(sd[f"{prefix}.q_proj.weight"])
    D = W_q.shape[1]
    hd = D // num_heads

    def qkv(name):
        W = _np(sd[f"{prefix}.{name}_proj.weight"])  # (D, D)
        b = _np(sd[f"{prefix}.{name}_proj.bias"])
        return {
            "kernel": W.T.reshape(D, num_heads, hd),
            "bias": b.reshape(num_heads, hd),
        }

    out["query"] = qkv("q")
    out["key"] = qkv("k")
    out["value"] = qkv("v")
    W_o = _np(sd[f"{prefix}.out_proj.weight"])  # (D, D)
    out["out"] = {
        "kernel": W_o.T.reshape(num_heads, hd, D),
        "bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }
    return out


def convert_wav2vec2(
    state_dict: Dict, num_layers: int = 12, num_heads: int = 12,
    naming: str = "fairseq"
) -> Dict:
    """fairseq (`naming="fairseq"`) or HF (`naming="hf"`) wav2vec2 state dict
    -> params for `Wav2Vec2Encoder`."""
    sd = fold_weight_norm({k: _np(v) for k, v in state_dict.items()})
    # HF >= 4.30 stores weight-normed conv as parametrizations.original0/1
    for k in list(sd):
        if k.endswith("parametrizations.weight.original0"):
            base = k[: -len("parametrizations.weight.original0")]
            g, v = sd[k], sd[base + "parametrizations.weight.original1"]
            axes = tuple(range(1, v.ndim))
            # torch parametrized weight_norm over dim=2 for pos_conv in HF
            norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
            sd[base + "weight"] = g * v / norm
    if naming == "fairseq":
        n = {
            "conv": "feature_extractor.conv_layers.{i}.0",
            "conv0_gn": "feature_extractor.conv_layers.0.2",
            "feat_ln": "layer_norm",
            "proj": "post_extract_proj",
            "pos_conv": "encoder.pos_conv.0",
            "enc_ln": "encoder.layer_norm",
            "layer": "encoder.layers.{i}",
            "attn": "self_attn",
            "attn_ln": "self_attn_layer_norm",
            "fc1": "fc1",
            "fc2": "fc2",
            "final_ln": "final_layer_norm",
        }
    else:
        n = {
            "conv": "feature_extractor.conv_layers.{i}.conv",
            "conv0_gn": "feature_extractor.conv_layers.0.layer_norm",
            "feat_ln": "feature_projection.layer_norm",
            "proj": "feature_projection.projection",
            "pos_conv": "encoder.pos_conv_embed.conv",
            "enc_ln": "encoder.layer_norm",
            "layer": "encoder.layers.{i}",
            "attn": "attention",
            "attn_ln": "layer_norm",
            "fc1": "feed_forward.intermediate_dense",
            "fc2": "feed_forward.output_dense",
            "final_ln": "final_layer_norm",
        }
        # HF attention proj names q_proj etc. same suffixes
    params: Dict = {"feature_extractor": {}}
    i = 0
    while f"{n['conv'].format(i=i)}.weight" in sd:
        params["feature_extractor"][f"conv_{i}"] = {
            "kernel": _conv1d_kernel(sd[f"{n['conv'].format(i=i)}.weight"])
        }
        i += 1
    params["feature_extractor"]["group_norm"] = _ln(sd, n["conv0_gn"])
    params["feature_norm"] = _ln(sd, n["feat_ln"])
    params["feature_projection"] = _dense(sd, n["proj"])
    params["pos_conv"] = {
        "conv": {
            "kernel": _conv1d_kernel(sd[f"{n['pos_conv']}.weight"]),
            "bias": _np(sd[f"{n['pos_conv']}.bias"]),
        }
    }
    params["encoder_norm"] = _ln(sd, n["enc_ln"])
    for i in range(num_layers):
        lp = n["layer"].format(i=i)
        params[f"layer_{i}"] = {
            "attention": _attention(sd, f"{lp}.{n['attn']}", num_heads),
            "layer_norm": _ln(sd, f"{lp}.{n['attn_ln']}"),
            "fc1": _dense(sd, f"{lp}.{n['fc1']}"),
            "fc2": _dense(sd, f"{lp}.{n['fc2']}"),
            "final_layer_norm": _ln(sd, f"{lp}.{n['final_ln']}"),
        }
    return params


def convert_utmos(lightning_state_dict: Dict, num_layers: int = 12,
                  num_heads: int = 12) -> Dict:
    """UTMOS lightning `state_dict` -> params for `UTMOSPredictor`."""
    sd = {k: _np(v) for k, v in lightning_state_dict.items()}
    ssl_sd = {
        k[len("feature_extractors.0.ssl_model.") :]: v
        for k, v in sd.items()
        if k.startswith("feature_extractors.0.ssl_model.")
    }
    params: Dict = {"ssl": convert_wav2vec2(ssl_sd, num_layers, num_heads, "fairseq")}
    params["domain_embedding"] = {
        "embedding": sd["feature_extractors.1.embedding.weight"]
    }
    params["judge_embedding"] = {
        "embedding": sd["output_layers.0.judge_embedding.weight"]
    }
    rnn = "output_layers.0.decoder_rnn"
    params["decoder_rnn"] = {
        "weight_ih_l0": sd[f"{rnn}.weight_ih_l0"],
        "weight_hh_l0": sd[f"{rnn}.weight_hh_l0"],
        "bias_ih_l0": sd[f"{rnn}.bias_ih_l0"],
        "bias_hh_l0": sd[f"{rnn}.bias_hh_l0"],
        "weight_ih_l0_reverse": sd[f"{rnn}.weight_ih_l0_reverse"],
        "weight_hh_l0_reverse": sd[f"{rnn}.weight_hh_l0_reverse"],
        "bias_ih_l0_reverse": sd[f"{rnn}.bias_ih_l0_reverse"],
        "bias_hh_l0_reverse": sd[f"{rnn}.bias_hh_l0_reverse"],
    }
    params["proj_0"] = _dense(sd, "output_layers.1.net.0")
    params["proj_1"] = _dense(sd, "output_layers.1.net.3")
    return params
