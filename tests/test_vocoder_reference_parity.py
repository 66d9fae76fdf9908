"""Vocoder output parity vs the reference torch implementations
(jik876 HiFi-GAN Generator and the SPARC SpkHiFiGANGenerator), including
weight-norm folding through the converters."""

import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
REF_HIFIGAN = "/root/reference/src/hifi-gan"


@pytest.fixture(scope="module")
def torch_mod():
    import types

    torch = pytest.importorskip("torch")
    for p in (REF_SRC, REF_HIFIGAN):
        if p not in sys.path:
            sys.path.insert(0, p)
    # model_ms's import chain reaches the Cython MAS; stub it (same as
    # tests/test_reference_parity.py)
    if "model.monotonic_align" not in sys.modules:
        stub = types.ModuleType("model.monotonic_align")
        stub.maximum_path = None
        sys.modules["model.monotonic_align"] = stub
    return torch


def test_mel_hifigan_parity(torch_mod, rng):
    import jax.numpy as jnp

    torch = torch_mod
    from env import AttrDict  # reference hifi-gan helpers
    from models import Generator  # reference generator

    from arttts_tpu.models.hifigan import HiFiGANGenerator
    from arttts_tpu.utils.torch_convert import convert_hifigan_generator

    h = AttrDict(
        {
            "resblock": "1",
            "upsample_rates": [8, 8, 2, 2],
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "upsample_initial_channel": 128,  # reduced for test speed
            "resblock_kernel_sizes": [3, 7, 11],
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        }
    )
    torch.manual_seed(0)
    g = Generator(h).eval()

    mel = rng.standard_normal((1, 80, 23)).astype(np.float32)
    with torch.no_grad():
        want = g(torch.from_numpy(mel)).numpy()  # (1, 1, T*256)

    params = convert_hifigan_generator(g.state_dict())
    gen = HiFiGANGenerator(upsample_initial_channel=128)
    got = np.asarray(
        gen.apply({"params": params}, jnp.asarray(np.transpose(mel, (0, 2, 1))))
    )
    np.testing.assert_allclose(
        got[:, :, 0], want[:, 0, :], atol=2e-4
    )


def test_sparc_generator_parity(torch_mod, rng):
    import jax.numpy as jnp

    torch = torch_mod
    from model_ms.sparc_generator import SpkHiFiGANGenerator

    from arttts_tpu.models.hifigan import (
        SparcHiFiGANGenerator,
        SpkSparcHiFiGANGenerator,
    )
    from arttts_tpu.utils.torch_convert import convert_spk_sparc

    torch.manual_seed(1)
    m = SpkHiFiGANGenerator(spk_ft_size=1024, channels=64).eval()

    c = rng.standard_normal((1, 14, 9)).astype(np.float32)
    c[0, 12] = np.abs(c[0, 12]) * 30 + 100  # plausible f0 in Hz
    spk_ft = rng.standard_normal((1, 1024)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(c.copy()), torch.from_numpy(spk_ft)).numpy()

    ckpt = {
        "state_dict": {
            "spk_ft": m.spk_enc.state_dict(),
            "generator": m.generator.state_dict(),
        }
    }
    params = convert_spk_sparc(ckpt)
    gen = SpkSparcHiFiGANGenerator(generator=SparcHiFiGANGenerator(channels=64))
    got = np.asarray(
        gen.apply(
            {"params": params},
            jnp.asarray(np.transpose(c, (0, 2, 1))),
            jnp.asarray(spk_ft),
        )
    )
    np.testing.assert_allclose(got[:, :, 0], want[:, 0, :], atol=2e-4)
