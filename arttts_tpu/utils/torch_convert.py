"""One-way converters: external PyTorch checkpoints -> flax param pytrees.

Covers the three external checkpoint families the reference consumes
(SURVEY.md §5.4): HiFi-GAN `hifigan.pt` (`["generator"]` state dict with
weight_norm, `vocoder_inference.py:79-81`), SPARC `sparc_*.ckpt`
(`state_dict.{spk_ft, generator}`, `hifigan_inference_ms.py:81-90`), and —
in `arttts_tpu/models/utmos.py` — the UTMOS lightning checkpoint.

torch is only used host-side here (CPU), never in the compute path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _wn_axes(g: np.ndarray):
    """Norm axes for torch weight_norm: the kept dim is the one where
    weight_g has extent > 1 (torch stores g with singleton dims elsewhere);
    dim=0 when g is all-singletons."""
    keep = [a for a, s in enumerate(g.shape) if s > 1]
    kept = keep[0] if keep else 0
    return tuple(a for a in range(g.ndim) if a != kept)


def fold_weight_norm(state_dict: Dict) -> Dict:
    """Fold torch weight_norm pairs (weight_g, weight_v) into plain weights:
    w = g * v / ||v||, norm over all dims except weight_norm's `dim` —
    inferred from weight_g's shape (dim=0 for HiFi-GAN convs, dim=2 for
    fairseq's wav2vec2 pos_conv)."""
    out = {}
    for k, v in state_dict.items():
        if k.endswith("weight_g"):
            continue
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = _np(state_dict[base + "weight_g"]).astype(np.float64)
            vv = _np(v).astype(np.float64)
            norm = np.sqrt((vv**2).sum(axis=_wn_axes(g), keepdims=True))
            out[base + "weight"] = (g * vv / norm).astype(np.float32)
        else:
            out[k] = _np(v)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (out, in, k) -> flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def convert_hifigan_generator(state_dict: Dict, num_ups: int = 4,
                              num_kernels: int = 3) -> Dict:
    """torch `Generator` state dict (hifi-gan/models.py:147) -> params for
    `arttts_tpu.models.hifigan.HiFiGANGenerator`. Accepts weight-normed or
    already-folded state dicts."""
    sd = fold_weight_norm({k: _np(v) for k, v in state_dict.items()})
    params: Dict = {}
    params["conv_pre"] = {
        "kernel": _conv_kernel(sd["conv_pre.weight"]),
        "bias": sd["conv_pre.bias"],
    }
    params["conv_post"] = {
        "kernel": _conv_kernel(sd["conv_post.weight"]),
        "bias": sd["conv_post.bias"],
    }
    for i in range(num_ups):
        params[f"ups_{i}"] = {
            "weight": sd[f"ups.{i}.weight"],  # torch layout kept
            "bias": sd[f"ups.{i}.bias"],
        }
        for j in range(num_kernels):
            n = i * num_kernels + j
            block: Dict = {}
            for c in range(3):  # dilations (1,3,5)
                block[f"conv1_{c}"] = {
                    "kernel": _conv_kernel(sd[f"resblocks.{n}.convs1.{c}.weight"]),
                    "bias": sd[f"resblocks.{n}.convs1.{c}.bias"],
                }
                block[f"conv2_{c}"] = {
                    "kernel": _conv_kernel(sd[f"resblocks.{n}.convs2.{c}.weight"]),
                    "bias": sd[f"resblocks.{n}.convs2.{c}.bias"],
                }
            params[f"resblock_{i}_{j}"] = block
    return params


def convert_sparc_generator(generator_sd: Dict, num_ups: int = 4,
                            num_blocks: int = 3, num_dil: int = 3) -> Dict:
    """torch SPARC `HiFiGANGenerator` state dict (sparc_generator.py:19) ->
    params for `SparcHiFiGANGenerator`."""
    sd = fold_weight_norm({k: _np(v) for k, v in generator_sd.items()})
    params: Dict = {}
    params["input_conv"] = {
        "kernel": _conv_kernel(sd["input_conv.weight"]),
        "bias": sd["input_conv.bias"],
    }
    params["output_conv"] = {
        "kernel": _conv_kernel(sd["output_conv.1.weight"]),
        "bias": sd["output_conv.1.bias"],
    }
    for i in range(num_ups):
        params[f"upsample_{i}"] = {
            "weight": sd[f"upsamples.{i}.1.weight"],
            "bias": sd[f"upsamples.{i}.1.bias"],
        }
        for j in range(num_blocks):
            n = i * num_blocks + j
            block: Dict = {}
            for c in range(num_dil):
                block[f"conv1_{c}"] = {
                    "kernel": _conv_kernel(sd[f"blocks.{n}.convs1.{c}.1.weight"]),
                    "bias": sd[f"blocks.{n}.convs1.{c}.1.bias"],
                }
                block[f"conv2_{c}"] = {
                    "kernel": _conv_kernel(sd[f"blocks.{n}.convs2.{c}.1.weight"]),
                    "bias": sd[f"blocks.{n}.convs2.{c}.1.bias"],
                }
                block[f"film_{c}_0"] = {
                    "kernel": sd[f"blocks.{n}.films.{c}.0.weight"].T,
                    "bias": sd[f"blocks.{n}.films.{c}.0.bias"],
                }
                block[f"film_{c}_1"] = {
                    "kernel": sd[f"blocks.{n}.films.{c}.3.weight"].T,
                    "bias": sd[f"blocks.{n}.films.{c}.3.bias"],
                }
            params[f"block_{i}_{j}"] = block
    return params


def convert_spk_sparc(ckpt: Dict) -> Dict:
    """Full SPARC checkpoint (`{config, state_dict: {spk_ft, generator}}`) ->
    params for `SpkSparcHiFiGANGenerator`."""
    spk_sd = {k: _np(v) for k, v in ckpt["state_dict"]["spk_ft"].items()}
    params = {
        "spk_enc_0": {
            "kernel": spk_sd["spk_fc.0.weight"].T,
            "bias": spk_sd["spk_fc.0.bias"],
        },
        "spk_enc_1": {
            "kernel": spk_sd["spk_fc.3.weight"].T,
            "bias": spk_sd["spk_fc.3.bias"],
        },
        "generator": convert_sparc_generator(ckpt["state_dict"]["generator"]),
    }
    return params


def convert_speaker_encoding_layer(sd: Dict) -> Dict:
    """`SpeakerEncodingLayer` state dict (spk_encoder.py:13-24) -> params for
    `arttts_tpu.models.tts.SpeakerEncodingLayer`."""
    sd = {k: _np(v) for k, v in sd.items()}
    return {
        "Dense_0": {"kernel": sd["spk_fc.0.weight"].T, "bias": sd["spk_fc.0.bias"]},
        "Dense_1": {"kernel": sd["spk_fc.3.weight"].T, "bias": sd["spk_fc.3.bias"]},
    }
