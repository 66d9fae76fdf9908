"""Structural conversion tests for the remaining torch checkpoint families:
UTMOS lightning (fairseq wav2vec2 + heads) and SPARC FiLM vocoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.hifigan import SparcHiFiGANGenerator, SpkSparcHiFiGANGenerator
from arttts_tpu.models.utmos import UTMOSPredictor
from arttts_tpu.models.wav2vec2 import Wav2Vec2Config
from arttts_tpu.utils.torch_convert import convert_spk_sparc
from arttts_tpu.utils.torch_convert_utmos import convert_utmos

SMALL = Wav2Vec2Config(
    conv_layers=((16, 10, 5), (16, 3, 2)),
    hidden_dim=16,
    num_layers=2,
    num_heads=2,
    ffn_dim=32,
    pos_conv_kernel=8,
    pos_conv_groups=2,
)


def _fairseq_ssl_sd(rng, cfg: Wav2Vec2Config):
    r = lambda *s: (0.05 * rng.standard_normal(s)).astype(np.float32)  # noqa
    sd = {}
    prev = 1
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = r(dim, prev, k)
        prev = dim
    sd["feature_extractor.conv_layers.0.2.weight"] = r(cfg.conv_layers[0][0])
    sd["feature_extractor.conv_layers.0.2.bias"] = r(cfg.conv_layers[0][0])
    sd["layer_norm.weight"] = r(prev)
    sd["layer_norm.bias"] = r(prev)
    sd["post_extract_proj.weight"] = r(cfg.hidden_dim, prev)
    sd["post_extract_proj.bias"] = r(cfg.hidden_dim)
    # weight-normed pos conv (dim 0 norm over rest)
    g = cfg.pos_conv_groups
    sd["encoder.pos_conv.0.weight_g"] = np.abs(r(cfg.hidden_dim, 1, 1)) + 0.5
    sd["encoder.pos_conv.0.weight_v"] = r(
        cfg.hidden_dim, cfg.hidden_dim // g, cfg.pos_conv_kernel
    )
    sd["encoder.pos_conv.0.bias"] = r(cfg.hidden_dim)
    sd["encoder.layer_norm.weight"] = r(cfg.hidden_dim)
    sd["encoder.layer_norm.bias"] = r(cfg.hidden_dim)
    D = cfg.hidden_dim
    for i in range(cfg.num_layers):
        lp = f"encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{lp}.self_attn.{nm}.weight"] = r(D, D)
            sd[f"{lp}.self_attn.{nm}.bias"] = r(D)
        sd[f"{lp}.self_attn_layer_norm.weight"] = r(D)
        sd[f"{lp}.self_attn_layer_norm.bias"] = r(D)
        sd[f"{lp}.fc1.weight"] = r(cfg.ffn_dim, D)
        sd[f"{lp}.fc1.bias"] = r(cfg.ffn_dim)
        sd[f"{lp}.fc2.weight"] = r(D, cfg.ffn_dim)
        sd[f"{lp}.fc2.bias"] = r(D)
        sd[f"{lp}.final_layer_norm.weight"] = r(D)
        sd[f"{lp}.final_layer_norm.bias"] = r(D)
    return sd


def test_convert_utmos_structure(rng):
    """Lightning-shaped state dict -> UTMOSPredictor params; forward runs."""
    n_judges, judge_dim, dom_dim, H = 300, 4, 4, 8  # >288: score() uses judge id 288
    r = lambda *s: (0.05 * rng.standard_normal(s)).astype(np.float32)  # noqa
    sd = {
        f"feature_extractors.0.ssl_model.{k}": v
        for k, v in _fairseq_ssl_sd(rng, SMALL).items()
    }
    sd["feature_extractors.1.embedding.weight"] = r(3, dom_dim)
    sd["output_layers.0.judge_embedding.weight"] = r(n_judges, judge_dim)
    in_dim = SMALL.hidden_dim + dom_dim + judge_dim
    for suffix in ("", "_reverse"):
        sd[f"output_layers.0.decoder_rnn.weight_ih_l0{suffix}"] = r(4 * H, in_dim)
        sd[f"output_layers.0.decoder_rnn.weight_hh_l0{suffix}"] = r(4 * H, H)
        sd[f"output_layers.0.decoder_rnn.bias_ih_l0{suffix}"] = r(4 * H)
        sd[f"output_layers.0.decoder_rnn.bias_hh_l0{suffix}"] = r(4 * H)
    sd["output_layers.1.net.0.weight"] = r(16, 2 * H)
    sd["output_layers.1.net.0.bias"] = r(16)
    sd["output_layers.1.net.3.weight"] = r(1, 16)
    sd["output_layers.1.net.3.bias"] = r(1)

    params = convert_utmos(sd, num_layers=SMALL.num_layers, num_heads=SMALL.num_heads)

    model = UTMOSPredictor(
        ssl_config=SMALL,
        n_domains=3,
        domain_dim=dom_dim,
        num_judges=n_judges,
        judge_dim=judge_dim,
        lstm_hidden=H,
        projection_hidden=16,
    )
    wav = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32) * 0.1)
    init_vars = model.init(
        jax.random.PRNGKey(0), wav, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32),
    )
    assert jax.tree_util.tree_structure(init_vars["params"]) == (
        jax.tree_util.tree_structure(params)
    )
    scores = model.score({"params": params}, wav)
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()


def test_convert_spk_sparc_structure(rng):
    """SPARC ckpt-shaped dict -> SpkSparcHiFiGANGenerator params."""
    r = lambda *s: (0.02 * rng.standard_normal(s)).astype(np.float32)  # noqa
    ch = 32
    gen_sd = {
        "input_conv.weight": r(ch, 14, 7),
        "input_conv.bias": r(ch),
        "output_conv.1.weight": r(1, ch // 16, 7),
        "output_conv.1.bias": r(1),
    }
    scales = [(8, 16), (8, 16), (2, 4), (2, 4)]
    c = ch
    for i, (u, k) in enumerate(scales):
        gen_sd[f"upsamples.{i}.1.weight"] = r(c, c // 2, k)
        gen_sd[f"upsamples.{i}.1.bias"] = r(c // 2)
        c //= 2
        for j in range(3):
            n = i * 3 + j
            kk = [3, 7, 11][j]
            for d in range(3):
                gen_sd[f"blocks.{n}.convs1.{d}.1.weight"] = r(c, c, kk)
                gen_sd[f"blocks.{n}.convs1.{d}.1.bias"] = r(c)
                gen_sd[f"blocks.{n}.convs2.{d}.1.weight"] = r(c, c, kk)
                gen_sd[f"blocks.{n}.convs2.{d}.1.bias"] = r(c)
                gen_sd[f"blocks.{n}.films.{d}.0.weight"] = r(c, 64)
                gen_sd[f"blocks.{n}.films.{d}.0.bias"] = r(c)
                gen_sd[f"blocks.{n}.films.{d}.3.weight"] = r(2 * c, c)
                gen_sd[f"blocks.{n}.films.{d}.3.bias"] = r(2 * c)
    spk_sd = {
        "spk_fc.0.weight": r(1024, 1024),
        "spk_fc.0.bias": r(1024),
        "spk_fc.3.weight": r(64, 1024),
        "spk_fc.3.bias": r(64),
    }
    ckpt = {"state_dict": {"spk_ft": spk_sd, "generator": gen_sd}}
    params = convert_spk_sparc(ckpt)

    model = SpkSparcHiFiGANGenerator(
        generator=SparcHiFiGANGenerator(channels=ch)
    )
    cfeat = jnp.asarray(rng.standard_normal((1, 6, 14)).astype(np.float32))
    spk_ft = jnp.asarray(rng.standard_normal((1, 1024)).astype(np.float32))
    init_vars = model.init(jax.random.PRNGKey(0), cfeat, spk_ft)
    assert jax.tree_util.tree_structure(init_vars["params"]) == (
        jax.tree_util.tree_structure(params)
    )
    wav = model.apply({"params": params}, cfeat, spk_ft)
    assert wav.shape == (1, 6 * 256, 1)
    assert np.isfinite(np.asarray(wav)).all()


def test_convert_speaker_encoding_layer(rng):
    import torch

    from arttts_tpu.models.tts import SpeakerEncodingLayer
    from arttts_tpu.utils.torch_convert import convert_speaker_encoding_layer

    lin1 = torch.nn.Linear(1024, 1024)
    lin2 = torch.nn.Linear(1024, 64)
    sd = {
        "spk_fc.0.weight": lin1.weight, "spk_fc.0.bias": lin1.bias,
        "spk_fc.3.weight": lin2.weight, "spk_fc.3.bias": lin2.bias,
    }
    params = convert_speaker_encoding_layer(sd)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    with torch.no_grad():
        want = lin2(torch.nn.functional.gelu(lin1(torch.from_numpy(x)))).numpy()
    layer = SpeakerEncodingLayer()
    got = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)
