"""Acoustic checkpoint conversion: a reference-shaped torch state dict must
convert into a param tree structurally identical to `GradTTSModel.init`'s,
and the converted model must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts
from tests.test_model import tiny_config


def _reference_shaped_state_dict(rng, n_vocab, n_ch, n_filter, n_filter_dp,
                                 n_layers, n_feats, dec_dim, window=4,
                                 has_embedding=True):
    """Emit a random state dict with the reference's torch module names and
    layouts (model/text_encoder.py + model/diffusion.py)."""
    sd = {}
    # small scale keeps the deep random U-Net numerically finite
    r = lambda *s: (0.05 * rng.standard_normal(s)).astype(np.float32)  # noqa: E731

    if has_embedding:
        sd["encoder.emb.weight"] = r(n_vocab, n_ch)
        width = n_ch
    else:
        width = 25

    # prenet: 3 convs k5 (hidden n_ch) + LN + 1x1 proj back to width
    dims = [width, n_ch, n_ch, n_ch]
    for i in range(3):
        sd[f"encoder.prenet.conv_layers.{i}.weight"] = r(dims[i + 1], dims[i], 5)
        sd[f"encoder.prenet.conv_layers.{i}.bias"] = r(dims[i + 1])
        sd[f"encoder.prenet.norm_layers.{i}.gamma"] = r(n_ch)
        sd[f"encoder.prenet.norm_layers.{i}.beta"] = r(n_ch)
    sd["encoder.prenet.proj.weight"] = r(width, n_ch, 1)
    sd["encoder.prenet.proj.bias"] = r(width)

    D = width  # hidden width through the transformer
    for i in range(n_layers):
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            sd[f"encoder.encoder.attn_layers.{i}.{nm}.weight"] = r(D, D, 1)
            sd[f"encoder.encoder.attn_layers.{i}.{nm}.bias"] = r(D)
        head_dim = D  # tiny config uses n_heads=1; rel tables are per-head
        sd[f"encoder.encoder.attn_layers.{i}.emb_rel_k"] = r(1, 2 * window + 1, head_dim)
        sd[f"encoder.encoder.attn_layers.{i}.emb_rel_v"] = r(1, 2 * window + 1, head_dim)
        sd[f"encoder.encoder.norm_layers_1.{i}.gamma"] = r(D)
        sd[f"encoder.encoder.norm_layers_1.{i}.beta"] = r(D)
        sd[f"encoder.encoder.norm_layers_2.{i}.gamma"] = r(D)
        sd[f"encoder.encoder.norm_layers_2.{i}.beta"] = r(D)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_1.weight"] = r(n_filter, D, 3)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_1.bias"] = r(n_filter)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_2.weight"] = r(D, n_filter, 3)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_2.bias"] = r(D)

    sd["encoder.proj_m.weight"] = r(n_feats, D, 1)
    sd["encoder.proj_m.bias"] = r(n_feats)
    sd["encoder.proj_w.conv_1.weight"] = r(n_filter_dp, D, 3)
    sd["encoder.proj_w.conv_1.bias"] = r(n_filter_dp)
    sd["encoder.proj_w.norm_1.gamma"] = r(n_filter_dp)
    sd["encoder.proj_w.norm_1.beta"] = r(n_filter_dp)
    sd["encoder.proj_w.conv_2.weight"] = r(n_filter_dp, n_filter_dp, 3)
    sd["encoder.proj_w.conv_2.bias"] = r(n_filter_dp)
    sd["encoder.proj_w.norm_2.gamma"] = r(n_filter_dp)
    sd["encoder.proj_w.norm_2.beta"] = r(n_filter_dp)
    sd["encoder.proj_w.proj.weight"] = r(1, n_filter_dp, 1)
    sd["encoder.proj_w.proj.bias"] = r(1)

    # --- estimator ------------------------------------------------------
    p = "decoder.estimator."
    sd[f"{p}mlp.0.weight"] = r(dec_dim * 4, dec_dim)
    sd[f"{p}mlp.0.bias"] = r(dec_dim * 4)
    sd[f"{p}mlp.2.weight"] = r(dec_dim, dec_dim * 4)
    sd[f"{p}mlp.2.bias"] = r(dec_dim)

    def resnet(key, din, dout):
        sd[f"{key}.mlp.1.weight"] = r(dout, dec_dim)
        sd[f"{key}.mlp.1.bias"] = r(dout)
        sd[f"{key}.block1.block.0.weight"] = r(dout, din, 3, 3)
        sd[f"{key}.block1.block.0.bias"] = r(dout)
        sd[f"{key}.block1.block.1.weight"] = r(dout)
        sd[f"{key}.block1.block.1.bias"] = r(dout)
        sd[f"{key}.block2.block.0.weight"] = r(dout, dout, 3, 3)
        sd[f"{key}.block2.block.0.bias"] = r(dout)
        sd[f"{key}.block2.block.1.weight"] = r(dout)
        sd[f"{key}.block2.block.1.bias"] = r(dout)
        if din != dout:
            sd[f"{key}.res_conv.weight"] = r(dout, din, 1, 1)
            sd[f"{key}.res_conv.bias"] = r(dout)

    def attn(key, dim):
        sd[f"{key}.fn.fn.to_qkv.weight"] = r(384, dim, 1, 1)
        sd[f"{key}.fn.fn.to_out.weight"] = r(dim, 128, 1, 1)
        sd[f"{key}.fn.fn.to_out.bias"] = r(dim)
        sd[f"{key}.fn.g"] = r(1)

    dims = [2, dec_dim, dec_dim * 2, dec_dim * 4]
    in_out = list(zip(dims[:-1], dims[1:]))
    for L, (din, dout) in enumerate(in_out):
        resnet(f"{p}downs.{L}.0", din, dout)
        resnet(f"{p}downs.{L}.1", dout, dout)
        attn(f"{p}downs.{L}.2", dout)
        if L < len(in_out) - 1:
            sd[f"{p}downs.{L}.3.conv.weight"] = r(dout, dout, 3, 3)
            sd[f"{p}downs.{L}.3.conv.bias"] = r(dout)
    mid = dims[-1]
    resnet(f"{p}mid_block1", mid, mid)
    attn(f"{p}mid_attn", mid)
    resnet(f"{p}mid_block2", mid, mid)
    for U, (din, dout) in enumerate(reversed(in_out[1:])):
        resnet(f"{p}ups.{U}.0", dout * 2, din)
        resnet(f"{p}ups.{U}.1", din, din)
        attn(f"{p}ups.{U}.2", din)
        sd[f"{p}ups.{U}.3.conv.weight"] = r(din, din, 4, 4)
        sd[f"{p}ups.{U}.3.conv.bias"] = r(din)
    sd[f"{p}final_block.block.0.weight"] = r(dec_dim, dec_dim, 3, 3)
    sd[f"{p}final_block.block.0.bias"] = r(dec_dim)
    sd[f"{p}final_block.block.1.weight"] = r(dec_dim)
    sd[f"{p}final_block.block.1.bias"] = r(dec_dim)
    sd[f"{p}final_conv.weight"] = r(1, dec_dim, 1, 1)
    sd[f"{p}final_conv.bias"] = r(1)
    return sd


def test_convert_grad_tts_structure_and_forward(rng):
    cfg = tiny_config(kind="text")
    model = GradTTSModel(config=cfg)
    x = jnp.asarray(rng.integers(1, cfg.encoder.n_vocab, (1, 7)))
    y = jnp.asarray(rng.standard_normal((1, 16, cfg.n_feats)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        x, jnp.array([7]), y, jnp.ones((1, 16, 1)), jnp.zeros((1,)),
    )

    sd = _reference_shaped_state_dict(
        rng,
        n_vocab=cfg.encoder.n_vocab,
        n_ch=cfg.encoder.n_channels,
        n_filter=cfg.encoder.filter_channels,
        n_filter_dp=cfg.encoder.filter_channels_dp,
        n_layers=cfg.encoder.n_layers,
        n_feats=cfg.n_feats,
        dec_dim=cfg.decoder.dim,
        window=cfg.encoder.window_size,
    )
    params = convert_grad_tts(sd, n_enc_layers=cfg.encoder.n_layers)

    ref_struct = jax.tree_util.tree_structure(variables["params"])
    got_struct = jax.tree_util.tree_structure(params)
    assert ref_struct == got_struct

    # shapes must match leaf-for-leaf
    jax.tree_util.tree_map(
        lambda a, b: (_ for _ in ()).throw(
            AssertionError(f"{a.shape} != {b.shape}")
        ) if a.shape != b.shape else None,
        variables["params"], params,
    )

    # converted params run end to end
    mu, logw, x_mask = model.apply(
        {"params": params}, x, jnp.array([7]), method="encode"
    )
    assert np.isfinite(np.asarray(mu)).all()
    noise = model.apply(
        {"params": params}, y, jnp.ones((1, 16, 1)), jnp.zeros_like(y),
        jnp.array([0.5]), method="estimate_noise",
    )
    assert np.isfinite(np.asarray(noise)).all()
