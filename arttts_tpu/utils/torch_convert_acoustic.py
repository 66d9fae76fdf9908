"""Converter: reference ArtTTS/GradTTS torch checkpoints -> flax params.

Maps the reference's `model.state_dict()` checkpoints (`grad_{n}.pt`,
`train.py:274`) onto `GradTTSModel` parameter trees so reference-trained
acoustic models run on TPU for output-parity validation (SURVEY.md §5.4).

Covered: the single-speaker family (ArtTTS / GradTTS with the 2D U-Net
decoder, n_spks == 1). Naming/layout rules:

  torch Conv1d  (out, in, k)      -> flax Conv kernel (k, in, out)
  torch Conv2d  (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)
  torch Linear  (out, in)         -> flax Dense kernel (in, out)
  torch 1x1 Conv1d (attention projections) -> flax Dense
  torch ConvTranspose2d (in, out, kh, kw)  -> ConvTranspose2dTorch.weight as-is

U-Net call-order numbering: downs resnets -> ResnetBlock2d_{0..5}, mid ->
_{6,7}, ups -> _{8..11}; attentions/rezeros 0..5 = [down0, down1, down2,
mid, up0, up1]; downsamples 0..1; upsamples (ConvTranspose2dTorch) 0..1.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from arttts_tpu.utils.torch_convert import _np


def _conv1d(sd, key):
    return {
        "kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 1, 0)),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _conv2d(sd, key):
    return {
        "kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0)),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _dense_from_linear(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def _dense_from_conv1x1(sd, key):
    return {
        "kernel": _np(sd[f"{key}.weight"])[:, :, 0].T,
        "bias": _np(sd[f"{key}.bias"]),
    }


def _channel_ln(sd, key):
    return {
        "LayerNorm_0": {
            "scale": _np(sd[f"{key}.gamma"]),
            "bias": _np(sd[f"{key}.beta"]),
        }
    }


def _groupnorm(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _block2d(sd, key):
    return {
        "Conv_0": _conv2d(sd, f"{key}.block.0"),
        "GroupNorm_0": _groupnorm(sd, f"{key}.block.1"),
    }


def _resnet_block(sd, key):
    out = {
        "Block2d_0": _block2d(sd, f"{key}.block1"),
        "Block2d_1": _block2d(sd, f"{key}.block2"),
        "Dense_0": _dense_from_linear(sd, f"{key}.mlp.1"),
    }
    if f"{key}.res_conv.weight" in sd:
        out["Conv_0"] = _dense_from_conv1x1_2d(sd, f"{key}.res_conv")
    return out


def _dense_from_conv1x1_2d(sd, key):
    """torch Conv2d (out, in, 1, 1) -> flax Dense kernel (in, out)."""
    out = {"kernel": _np(sd[f"{key}.weight"])[:, :, 0, 0].T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _linear_attention(sd, key):
    return {
        "Conv_0": {"kernel": _np(sd[f"{key}.to_qkv.weight"])[:, :, 0, 0].T},
        "Conv_1": _dense_from_conv1x1_2d(sd, f"{key}.to_out"),
    }


def convert_encoder(sd: Dict, prefix: str = "encoder.", n_layers: int = 6,
                    has_embedding: bool = False) -> Dict:
    """IpaTraitEncoder / TextEncoder state dict -> flax `encoder` subtree."""
    p = prefix
    enc: Dict = {}
    if has_embedding:
        enc["Embed_0"] = {"embedding": _np(sd[f"{p}emb.weight"])}

    prenet: Dict = {}
    i = 0
    while f"{p}prenet.conv_layers.{i}.weight" in sd:
        prenet[f"Conv_{i}"] = _conv1d(sd, f"{p}prenet.conv_layers.{i}")
        prenet[f"ChannelLayerNorm_{i}"] = _channel_ln(sd, f"{p}prenet.norm_layers.{i}")
        i += 1
    prenet[f"Conv_{i}"] = _conv1d(sd, f"{p}prenet.proj")
    enc["ConvReluNorm_0"] = prenet

    trans: Dict = {}
    for i in range(n_layers):
        attn = {
            "Dense_0": _dense_from_conv1x1(sd, f"{p}encoder.attn_layers.{i}.conv_q"),
            "Dense_1": _dense_from_conv1x1(sd, f"{p}encoder.attn_layers.{i}.conv_k"),
            "Dense_2": _dense_from_conv1x1(sd, f"{p}encoder.attn_layers.{i}.conv_v"),
            "Dense_3": _dense_from_conv1x1(sd, f"{p}encoder.attn_layers.{i}.conv_o"),
            "emb_rel_k": _np(sd[f"{p}encoder.attn_layers.{i}.emb_rel_k"]),
            "emb_rel_v": _np(sd[f"{p}encoder.attn_layers.{i}.emb_rel_v"]),
        }
        trans[f"RelPositionMultiHeadAttention_{i}"] = attn
        trans[f"ChannelLayerNorm_{2 * i}"] = _channel_ln(
            sd, f"{p}encoder.norm_layers_1.{i}"
        )
        trans[f"ChannelLayerNorm_{2 * i + 1}"] = _channel_ln(
            sd, f"{p}encoder.norm_layers_2.{i}"
        )
        trans[f"FFN_{i}"] = {
            "Conv_0": _conv1d(sd, f"{p}encoder.ffn_layers.{i}.conv_1"),
            "Conv_1": _conv1d(sd, f"{p}encoder.ffn_layers.{i}.conv_2"),
        }
    enc["TransformerEncoder_0"] = trans

    enc["proj_m"] = _conv1d(sd, f"{p}proj_m")
    if f"{p}proj_w.conv_1.weight" in sd:
        enc["proj_w"] = {
            "Conv_0": _conv1d(sd, f"{p}proj_w.conv_1"),
            "ChannelLayerNorm_0": _channel_ln(sd, f"{p}proj_w.norm_1"),
            "Conv_1": _conv1d(sd, f"{p}proj_w.conv_2"),
            "ChannelLayerNorm_1": _channel_ln(sd, f"{p}proj_w.norm_2"),
            "Conv_2": _conv1d(sd, f"{p}proj_w.proj"),
        }
    return enc


def convert_estimator2d(sd: Dict, prefix: str = "decoder.estimator.",
                        num_resolutions: int = 3) -> Dict:
    """GradLogPEstimator2d state dict -> flax `estimator` subtree."""
    p = prefix
    est: Dict = {
        "Dense_0": _dense_from_linear(sd, f"{p}mlp.0"),
        "Dense_1": _dense_from_linear(sd, f"{p}mlp.2"),
    }

    res_idx = 0
    attn_idx = 0

    def add_attn(torch_key):
        nonlocal attn_idx
        est[f"LinearAttention2d_{attn_idx}"] = _linear_attention(
            sd, f"{torch_key}.fn.fn"
        )
        est[f"Rezero_{attn_idx}"] = {"g": _np(sd[f"{torch_key}.fn.g"])}
        attn_idx += 1

    for level in range(num_resolutions):
        for j in (0, 1):
            est[f"ResnetBlock2d_{res_idx}"] = _resnet_block(
                sd, f"{p}downs.{level}.{j}"
            )
            res_idx += 1
        add_attn(f"{p}downs.{level}.2")
        if level < num_resolutions - 1:
            est[f"Downsample2d_{level}"] = {
                "Conv_0": _conv2d(sd, f"{p}downs.{level}.3.conv")
            }

    est[f"ResnetBlock2d_{res_idx}"] = _resnet_block(sd, f"{p}mid_block1")
    res_idx += 1
    add_attn(f"{p}mid_attn")
    est[f"ResnetBlock2d_{res_idx}"] = _resnet_block(sd, f"{p}mid_block2")
    res_idx += 1

    for up in range(num_resolutions - 1):
        for j in (0, 1):
            est[f"ResnetBlock2d_{res_idx}"] = _resnet_block(sd, f"{p}ups.{up}.{j}")
            res_idx += 1
        add_attn(f"{p}ups.{up}.2")
        est[f"ConvTranspose2dTorch_{up}"] = {
            "weight": _np(sd[f"{p}ups.{up}.3.conv.weight"]),
            "bias": _np(sd[f"{p}ups.{up}.3.conv.bias"]),
        }

    est["Block2d_0"] = _block2d(sd, f"{p}final_block")
    est["Conv_0"] = _dense_from_conv1x1_2d(sd, f"{p}final_conv")
    return est


def _conv1x3_2d(sd, key, use_bias=True):
    """torch Conv2d (out, in, 1, 3) -> flax Conv kernel (1, 3, in, out)."""
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0))}
    if use_bias and f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _art_attention(sd, key):
    """ArtChannelsAttention (diffusion_1D.py:105-152): (1,3) qkv conv +
    1x1 out conv (-> Dense)."""
    return {
        "Conv_0": _conv1x3_2d(sd, f"{key}.to_qkv", use_bias=False),
        "Conv_1": _dense_from_conv1x1_2d(sd, f"{key}.to_out"),
    }


def _block1d(sd, key):
    return {
        "Conv_0": _conv1x3_2d(sd, f"{key}.block.0"),
        "ArtChannelsAttention_0": _art_attention(sd, f"{key}.block.1"),
        "GroupNorm_0": _groupnorm(sd, f"{key}.block.2"),
    }


def _resnet_block1d(sd, key):
    out = {
        "Block1d_0": _block1d(sd, f"{key}.block1"),
        "Block1d_1": _block1d(sd, f"{key}.block2"),
        "Dense_0": _dense_from_linear(sd, f"{key}.mlp.1"),
    }
    if f"{key}.res_conv.weight" in sd:
        out["Conv_0"] = _dense_from_conv1x1_2d(sd, f"{key}.res_conv")
    return out


def convert_estimator1d(sd: Dict, prefix: str = "decoder.estimator.",
                        num_resolutions: int = 3) -> Dict:
    """Diffusion1D / Diffusion1DPreblock estimator state dict -> flax
    `estimator` subtree (GradLogPEstimator1d)."""
    p = prefix
    est: Dict = {
        "Dense_0": _dense_from_linear(sd, f"{p}mlp.0"),
        "Dense_1": _dense_from_linear(sd, f"{p}mlp.2"),
    }

    res_idx = 0
    attn_idx = 0

    def add_attn(torch_key):
        nonlocal attn_idx
        est[f"LinearAttention2d_{attn_idx}"] = _linear_attention(
            sd, f"{torch_key}.fn.fn"
        )
        est[f"Rezero_{attn_idx}"] = {"g": _np(sd[f"{torch_key}.fn.g"])}
        attn_idx += 1

    for level in range(num_resolutions):
        for j in (0, 1):
            est[f"ResnetBlock1d_{res_idx}"] = _resnet_block1d(
                sd, f"{p}downs.{level}.{j}"
            )
            res_idx += 1
        add_attn(f"{p}downs.{level}.2")
        if level < num_resolutions - 1:
            est[f"Downsample2d_{level}"] = {
                "Conv_0": _conv2d(sd, f"{p}downs.{level}.3.conv")
            }

    est[f"ResnetBlock1d_{res_idx}"] = _resnet_block1d(sd, f"{p}mid_block1")
    res_idx += 1
    add_attn(f"{p}mid_attn")
    est[f"ResnetBlock1d_{res_idx}"] = _resnet_block1d(sd, f"{p}mid_block2")
    res_idx += 1

    for up in range(num_resolutions - 1):
        for j in (0, 1):
            est[f"ResnetBlock1d_{res_idx}"] = _resnet_block1d(sd, f"{p}ups.{up}.{j}")
            res_idx += 1
        add_attn(f"{p}ups.{up}.2")
        est[f"ConvTranspose2dTorch_{up}"] = {
            "weight": _np(sd[f"{p}ups.{up}.3.conv.weight"]),
            "bias": _np(sd[f"{p}ups.{up}.3.conv.bias"]),
        }

    est["Block1d_0"] = _block1d(sd, f"{p}final_block")
    est["Conv_0"] = _dense_from_conv1x1_2d(sd, f"{p}final_conv")
    return est


def convert_grad_tts(state_dict: Dict, n_enc_layers: int = 6,
                     has_embedding: bool = None,
                     decoder_kind: str = "unet2d") -> Dict:
    """Full ArtTTS/GradTTS/AttentionTTS (n_spks == 1) state dict -> params
    for `GradTTSModel`."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    if has_embedding is None:
        has_embedding = "encoder.emb.weight" in sd
    if decoder_kind == "unet1d":
        est = convert_estimator1d(sd, "decoder.estimator.")
    else:
        est = convert_estimator2d(sd, "decoder.estimator.")
        if "decoder.estimator.preblock.block.0.weight" in sd:
            est["PreBlock_0"] = {
                "Conv_0": {
                    "kernel": np.transpose(
                        _np(sd["decoder.estimator.preblock.block.0.weight"]),
                        (2, 3, 1, 0),
                    ),
                    "bias": _np(sd["decoder.estimator.preblock.block.0.bias"]),
                },
                "ArtChannelsAttention_0": _art_attention(
                    sd, "decoder.estimator.preblock.block.1"
                ),
            }
    return {
        "encoder": convert_encoder(sd, "encoder.", n_enc_layers, has_embedding),
        "estimator": est,
    }


def convert_grad_ttartic(state_dict: Dict, n_enc_layers: int = 6) -> Dict:
    """Multi-speaker `GradTTArtic` state dict (model_ms/tts.py:25-95) ->
    params for `GradTTSModel(name="grad_ttartic")`.

    Differences vs the single-speaker converter: a SpeakerEncodingLayer
    subtree, an always-on speaker MLP in the estimator (Dense_2/Dense_3
    after the time MLP), and no duration predictor on either side
    (use_duration_predictor=False in the v6 presets).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    # the ms encoder has no proj_w (phnm_encoder.py:326-391) and neither does
    # the unified model when use_duration_predictor=False
    enc = convert_encoder(sd, "encoder.", n_enc_layers, has_embedding=False)

    est = convert_estimator2d(sd, "decoder.estimator.")
    # speaker MLP (diffusion.py ms variant: spk_mlp.0 / spk_mlp.2)
    est["Dense_2"] = _dense_from_linear(sd, "decoder.estimator.spk_mlp.0")
    est["Dense_3"] = _dense_from_linear(sd, "decoder.estimator.spk_mlp.2")

    return {
        "encoder": enc,
        "estimator": est,
        "spk_encoder": {
            "Dense_0": {"kernel": sd["spk_enc.spk_fc.0.weight"].T,
                        "bias": sd["spk_enc.spk_fc.0.bias"]},
            "Dense_1": {"kernel": sd["spk_enc.spk_fc.3.weight"].T,
                        "bias": sd["spk_enc.spk_fc.3.bias"]},
        },
    }
