"""Benchmark: end-to-end text->waveform RTF on the current JAX backend.

Measures the reference's headline protocol (BASELINE.md): flagship GradTTS
v2-scale text->mel (50 reverse-diffusion Euler steps, temperature 1.0, batch
1 — ref `arttts_inference.py:332-348,227-231`) chained into HiFi-GAN mel
vocoding (`vocoder_inference.py`), generating a full 8.9 s utterance
(durations pinned so the decoder fills its 768-frame bucket — i.e. compute
and audio length agree). Prints ONE JSON line.

Timing notes: `block_until_ready` does not synchronize through remote-device
tunnels, so iteration cost is measured differentially — time(N2 runs +
scalar fetch) - time(N1 runs + fetch), divided by N2 - N1 — which cancels
both the fetch round-trip and per-call dispatch bias.

vs_baseline: north-star target is RTF <= 0.02 per chip;
vs_baseline = target_rtf / measured_rtf (>1 is better than target).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import synthesize_to_wav
    from arttts_tpu.models.hifigan import HiFiGANGenerator
    from arttts_tpu.models.tts import GradTTSModel

    cfg = get_preset("v2")
    model = GradTTSModel(config=cfg.model)

    B = 1  # reference protocol: batch size 1
    T_x = 96  # ~typical LJSpeech sentence, interspersed symbols
    MAX_FRAMES = 768  # 8.9 s of audio at 22.05 kHz / hop 256
    N_STEPS = 50

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(1, cfg.model.encoder.n_vocab, size=(B, T_x)))
    x_lengths = jnp.array([T_x] * B, dtype=jnp.int32)
    # pin durations so y_lengths == MAX_FRAMES: audio length matches compute
    durations = jnp.full((B, T_x), MAX_FRAMES / T_x, jnp.float32)
    y_init = jnp.asarray(
        rng.standard_normal((B, 64, cfg.model.n_feats)).astype(np.float32)
    )
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        x,
        x_lengths,
        y_init,
        jnp.ones((B, 64, 1)),
        jnp.zeros((B,)),
    )

    vocoder = HiFiGANGenerator()
    voc_vars = vocoder.init(
        jax.random.PRNGKey(1), jnp.zeros((B, MAX_FRAMES, 80), jnp.float32)
    )

    def run(k):
        # the full serving path is ONE jitted program (one device dispatch)
        return synthesize_to_wav(
            model, variables, vocoder, voc_vars, k, x, x_lengths,
            n_timesteps=N_STEPS, max_frames=MAX_FRAMES, x_durations=durations,
        )

    base_key = jax.random.PRNGKey(1)
    out = run(base_key)
    float(jnp.sum(out[0]))  # compile + full device sync

    def timed(n):
        keys = [jax.random.fold_in(base_key, i) for i in range(n)]
        float(jnp.sum(keys[-1]))
        t0 = time.perf_counter()
        for k in keys:
            out = run(k)
        float(jnp.sum(out[0]))
        return time.perf_counter() - t0, out

    timed(2)  # warm
    t1, _ = min((timed(2) for _ in range(2)), key=lambda p: p[0])
    t2, out = min((timed(12) for _ in range(2)), key=lambda p: p[0])
    elapsed = (t2 - t1) / 10

    frames = int(np.asarray(out[1]).max())
    audio_seconds = frames * 256 / 22050.0
    rtf = elapsed / audio_seconds

    target = 0.02
    print(
        json.dumps(
            {
                "metric": "text2wav_rtf_50step",
                "value": round(rtf, 5),
                "unit": "rtf_per_chip",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
