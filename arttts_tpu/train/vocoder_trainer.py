"""HiFi-GAN vocoder training step (generator + MPD/MSD adversarial).

The reference vendors the full jik876 GAN training parts but never trains a
vocoder in-repo (SURVEY.md §2.4: "present but unused"). Here the training
step is implemented and tested so vocoders *can* be (re)trained natively:
generator loss = adv + 2*feature-matching + 45*mel-L1 (the standard HiFi-GAN
recipe the discriminators/losses at `hifi-gan/models.py:212-405` feed),
discriminator loss = LSGAN real/fake. Both steps jit into single SPMD
programs; batches shard over the mesh "data" axis like the acoustic trainer.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from arttts_tpu.audio.mel import MelConfig, MelSpectrogram
from arttts_tpu.models.hifigan import (
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


class VocoderTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    gen_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False)


class VocoderGAN:
    """Bundles generator + both discriminators + mel loss."""

    def __init__(self, generator: HiFiGANGenerator = None,
                 mel_config: MelConfig = MelConfig()):
        self.generator = generator or HiFiGANGenerator()
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.mel = MelSpectrogram(mel_config)

    def init_state(self, rng, mel_frames: int = 32,
                   lr: float = 2e-4, betas=(0.8, 0.99)) -> VocoderTrainState:
        import numpy as np

        r1, r2, r3 = jax.random.split(rng, 3)
        mel = jnp.zeros((1, mel_frames, 80), jnp.float32)
        gen_vars = self.generator.init(r1, mel)
        wav = jnp.zeros(
            (1, mel_frames * int(np.prod(self.generator.upsample_rates)), 1),
            jnp.float32,
        )
        disc_vars = {
            "mpd": self.mpd.init(r2, wav, wav)["params"],
            "msd": self.msd.init(r3, wav, wav)["params"],
        }
        gen_tx = optax.adam(lr, b1=betas[0], b2=betas[1])
        disc_tx = optax.adam(lr, b1=betas[0], b2=betas[1])
        return VocoderTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_vars["params"],
            disc_params=disc_vars,
            gen_opt=gen_tx.init(gen_vars["params"]),
            disc_opt=disc_tx.init(disc_vars),
            gen_tx=gen_tx,
            disc_tx=disc_tx,
        )

    def make_train_step(self):
        gen_apply = self.generator.apply
        mpd_apply = self.mpd.apply
        msd_apply = self.msd.apply
        mel_fn = self.mel

        def step(state: VocoderTrainState, batch) -> Tuple[VocoderTrainState, dict]:
            mel, wav = batch["mel"], batch["wav"]  # (B,T,80), (B,S,1)

            # --- discriminator update ---------------------------------
            wav_hat = gen_apply({"params": state.gen_params}, mel)
            wav_hat_sg = jax.lax.stop_gradient(wav_hat)

            def disc_loss_fn(dp):
                y_df_r, y_df_g, _, _ = mpd_apply(
                    {"params": dp["mpd"]}, wav, wav_hat_sg
                )
                y_ds_r, y_ds_g, _, _ = msd_apply(
                    {"params": dp["msd"]}, wav, wav_hat_sg
                )
                return discriminator_loss(y_df_r, y_df_g) + discriminator_loss(
                    y_ds_r, y_ds_g
                )

            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)
            d_updates, new_d_opt = state.disc_tx.update(
                d_grads, state.disc_opt, state.disc_params
            )
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)

            # --- generator update -------------------------------------
            def gen_loss_fn(gp):
                w_hat = gen_apply({"params": gp}, mel)
                mel_hat = mel_fn(w_hat[:, :, 0])
                mel_ref = mel_fn(wav[:, :, 0])
                loss_mel = jnp.mean(jnp.abs(mel_hat - mel_ref)) * 45.0
                _, y_df_g, f_df_r, f_df_g = mpd_apply(
                    {"params": new_disc_params["mpd"]}, wav, w_hat
                )
                _, y_ds_g, f_ds_r, f_ds_g = msd_apply(
                    {"params": new_disc_params["msd"]}, wav, w_hat
                )
                loss_fm = feature_loss(f_df_r, f_df_g) + feature_loss(f_ds_r, f_ds_g)
                loss_adv = generator_loss(y_df_g) + generator_loss(y_ds_g)
                return loss_adv + loss_fm + loss_mel, {
                    "mel_l1": loss_mel / 45.0,
                    "adv": loss_adv,
                    "fm": loss_fm,
                }

            (g_loss, parts), g_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(state.gen_params)
            g_updates, new_g_opt = state.gen_tx.update(
                g_grads, state.gen_opt, state.gen_params
            )
            new_gen_params = optax.apply_updates(state.gen_params, g_updates)

            new_state = state.replace(
                step=state.step + 1,
                gen_params=new_gen_params,
                disc_params=new_disc_params,
                gen_opt=new_g_opt,
                disc_opt=new_d_opt,
            )
            metrics = dict(parts)
            metrics.update({"gen_loss": g_loss, "disc_loss": d_loss})
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))
