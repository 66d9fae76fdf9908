"""HiFi-GAN GAN training step smoke test (tiny generator)."""

import jax
import numpy as np
import pytest

from arttts_tpu.models.hifigan import HiFiGANGenerator
from arttts_tpu.train.vocoder_trainer import VocoderGAN


@pytest.mark.slow
def test_vocoder_gan_step(rng):
    gen = HiFiGANGenerator(
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gan = VocoderGAN(generator=gen)
    state = gan.init_state(jax.random.PRNGKey(0), mel_frames=8)
    step = gan.make_train_step()

    mel = rng.standard_normal((2, 8, 80)).astype(np.float32)
    wav = (rng.standard_normal((2, 8 * 256, 1)) * 0.1).astype(np.float32)
    state, metrics = step(state, {"mel": mel, "wav": wav})
    assert int(state.step) == 1
    for k in ("gen_loss", "disc_loss", "mel_l1", "adv", "fm"):
        assert np.isfinite(float(metrics[k])), k
