"""Vocoder tests: torch-exact transposed convs, weight-norm folding,
weight-converted resblock parity, generator shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from arttts_tpu.models.convs import conv_transpose_1d
from arttts_tpu.models.hifigan import (
    HiFiGANGenerator,
    ResBlock,
    SparcHiFiGANGenerator,
    SpkSparcHiFiGANGenerator,
)
from arttts_tpu.utils.torch_convert import (
    _conv_kernel,
    convert_hifigan_generator,
    fold_weight_norm,
)


def test_conv_transpose_matches_torch(rng):
    for (cin, cout, k, s, p, op) in [
        (4, 3, 16, 8, 4, 0),
        (4, 3, 16, 8, 4, 1),
        (2, 2, 4, 2, 1, 0),
        (3, 5, 11, 1, 5, 0),
    ]:
        x = rng.standard_normal((2, 12, cin)).astype(np.float32)
        w = rng.standard_normal((cin, cout, k)).astype(np.float32)
        got = np.asarray(
            conv_transpose_1d(jnp.asarray(x), jnp.asarray(w), s, p, op)
        )
        want = F.conv_transpose1d(
            torch.from_numpy(x).permute(0, 2, 1),
            torch.from_numpy(w),
            stride=s,
            padding=p,
            output_padding=op,
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_conv_transpose_polyphase_matches_torch(rng):
    """The opt-in polyphase K==2*stride rewrite is float-exact vs torch."""
    for (cin, cout, k, s, p, op) in [
        (4, 3, 16, 8, 4, 0),
        (4, 3, 16, 8, 4, 1),
        (2, 2, 4, 2, 1, 0),
        (3, 5, 6, 3, 2, 1),
    ]:
        x = rng.standard_normal((2, 12, cin)).astype(np.float32)
        w = rng.standard_normal((cin, cout, k)).astype(np.float32)
        got = np.asarray(
            conv_transpose_1d(
                jnp.asarray(x), jnp.asarray(w), s, p, op, polyphase=True
            )
        )
        want = F.conv_transpose1d(
            torch.from_numpy(x).permute(0, 2, 1),
            torch.from_numpy(w),
            stride=s,
            padding=p,
            output_padding=op,
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_fold_weight_norm_matches_torch(rng):
    for dim in (0, 2):  # dim=0: HiFi-GAN convs; dim=2: fairseq pos_conv
        conv = torch.nn.Conv1d(4, 8, 3)
        conv = torch.nn.utils.weight_norm(conv, dim=dim)
        sd = {f"c.{k}": v for k, v in conv.state_dict().items()}
        folded = fold_weight_norm(sd)
        torch.nn.utils.remove_weight_norm(conv)
        np.testing.assert_allclose(
            folded["c.weight"], conv.weight.detach().numpy(), atol=1e-6
        )


def test_resblock_weight_conversion_parity(rng):
    """A dilated residual stack built in torch, weights converted, must match
    the flax ResBlock output."""
    ch, k, dil = 6, 3, (1, 3, 5)

    convs1 = [torch.nn.Conv1d(ch, ch, k, dilation=d, padding=(k - 1) // 2 * d) for d in dil]
    convs2 = [torch.nn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dil]

    def torch_forward(x):
        for c1, c2 in zip(convs1, convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x

    x = rng.standard_normal((2, 20, ch)).astype(np.float32)
    with torch.no_grad():
        want = (
            torch_forward(torch.from_numpy(x).permute(0, 2, 1))
            .permute(0, 2, 1)
            .numpy()
        )

    params = {}
    for i, (c1, c2) in enumerate(zip(convs1, convs2)):
        params[f"conv1_{i}"] = {
            "kernel": _conv_kernel(c1.weight.detach().numpy()),
            "bias": c1.bias.detach().numpy(),
        }
        params[f"conv2_{i}"] = {
            "kernel": _conv_kernel(c2.weight.detach().numpy()),
            "bias": c2.bias.detach().numpy(),
        }
    block = ResBlock(channels=ch, kernel_size=k, dilations=dil)
    got = np.asarray(block.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hifigan_generator_shapes(rng):
    gen = HiFiGANGenerator()
    mel = jnp.asarray(rng.standard_normal((1, 17, 80)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (1, 17 * 256, 1)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_sparc_generator_shapes(rng):
    gen = SparcHiFiGANGenerator(channels=64)
    c = jnp.asarray(rng.standard_normal((2, 10, 14)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), c, spk)
    wav = gen.apply(variables, c, spk)
    assert wav.shape == (2, 10 * 256, 1)
    assert np.isfinite(np.asarray(wav)).all()


def test_spk_sparc_generator(rng):
    gen = SpkSparcHiFiGANGenerator(
        generator=SparcHiFiGANGenerator(channels=32)
    )
    c = jnp.asarray(rng.standard_normal((1, 8, 14)).astype(np.float32))
    spk_ft = jnp.asarray(rng.standard_normal((1, 1024)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), c, spk_ft)
    wav = gen.apply(variables, c, spk_ft)
    assert wav.shape == (1, 8 * 256, 1)


def test_hifigan_full_conversion(rng):
    """Synthesize a reference-shaped torch state dict (random weights, with
    weight norm keys) and check the converter produces a complete flax param
    tree that the generator accepts."""
    gen = HiFiGANGenerator()
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel)

    sd = {}
    sd["conv_pre.weight"] = rng.standard_normal((512, 80, 7)).astype(np.float32)
    sd["conv_pre.bias"] = rng.standard_normal((512,)).astype(np.float32)
    ch = 512
    rates = [(8, 16), (8, 16), (2, 4), (2, 4)]
    for i, (u, k) in enumerate(rates):
        sd[f"ups.{i}.weight"] = rng.standard_normal(
            (ch, ch // 2, k)
        ).astype(np.float32)
        sd[f"ups.{i}.bias"] = rng.standard_normal((ch // 2,)).astype(np.float32)
        ch //= 2
        for j in range(3):
            n = i * 3 + j
            for c in range(3):
                sd[f"resblocks.{n}.convs1.{c}.weight"] = rng.standard_normal(
                    (ch, ch, [3, 7, 11][j])
                ).astype(np.float32)
                sd[f"resblocks.{n}.convs1.{c}.bias"] = rng.standard_normal(
                    (ch,)
                ).astype(np.float32)
                sd[f"resblocks.{n}.convs2.{c}.weight"] = rng.standard_normal(
                    (ch, ch, [3, 7, 11][j])
                ).astype(np.float32)
                sd[f"resblocks.{n}.convs2.{c}.bias"] = rng.standard_normal(
                    (ch,)
                ).astype(np.float32)
    sd["conv_post.weight"] = rng.standard_normal((1, 32, 7)).astype(np.float32)
    sd["conv_post.bias"] = rng.standard_normal((1,)).astype(np.float32)

    params = convert_hifigan_generator(sd)
    # structure must match what init produced
    flat_a = jax.tree_util.tree_structure(variables["params"])
    flat_b = jax.tree_util.tree_structure(params)
    assert flat_a == flat_b, f"{flat_a}\n!=\n{flat_b}"
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (1, 8 * 256, 1)
