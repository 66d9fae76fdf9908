"""Benchmark: end-to-end acoustic synthesis RTF on the current JAX backend.

Measures the reference's headline inference protocol (BASELINE.md): text->mel
with the flagship GradTTS v2-scale model, 50 reverse-diffusion Euler steps,
temperature 1.0 (ref `arttts_inference.py:332-348`), on a typical LJSpeech
utterance length. Prints ONE JSON line with RTF per chip.

vs_baseline: the driver's north-star target is RTF <= 0.02/chip; we report
vs_baseline = target_rtf / measured_rtf (>1 means faster than target).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import synthesize
    from arttts_tpu.models.tts import GradTTSModel

    cfg = get_preset("v2")
    model = GradTTSModel(config=cfg.model)

    B = 1  # reference protocol: batch size 1 (arttts_inference.py:227-231)
    T_x = 96  # ~typical LJSpeech sentence, interspersed symbols
    MAX_FRAMES = 768  # ~8.9 s of audio at 22.05 kHz / hop 256
    N_STEPS = 50

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(1, cfg.model.encoder.n_vocab, size=(B, T_x)))
    x_lengths = jnp.array([T_x] * B, dtype=jnp.int32)
    y_init = jnp.asarray(
        rng.standard_normal((B, 64, cfg.model.n_feats)).astype(np.float32)
    )
    variables = model.init(
        {"params": key, "dropout": key},
        x,
        x_lengths,
        y_init,
        jnp.ones((B, 64, 1)),
        jnp.zeros((B,)),
    )

    def run(k):
        return synthesize(
            model,
            variables,
            k,
            x,
            x_lengths,
            n_timesteps=N_STEPS,
            max_frames=MAX_FRAMES,
        )

    # compile
    out = run(jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    # timed runs
    n_iters = 5
    start = time.perf_counter()
    for i in range(n_iters):
        out = run(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - start) / n_iters

    frames = int(np.asarray(out[3]).max())
    audio_seconds = frames * 256 / 22050.0
    rtf = elapsed / audio_seconds

    target = 0.02
    print(
        json.dumps(
            {
                "metric": "text2mel_rtf_50step",
                "value": round(rtf, 5),
                "unit": "rtf_per_chip",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
