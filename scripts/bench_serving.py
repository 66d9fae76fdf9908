"""Hardware measurement of the two-dispatch serving path (r4 task 1).

Measures, at the predicted-duration bucket (and optionally a forced list of
buckets), the old r3 protocol (predict_lengths + fused synthesize: encoder
twice) vs the new split path (encode_text once + decode-from-encodings).

Usage: python scripts/bench_serving.py [bucket ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import differential_time  # noqa: E402

from arttts_tpu.core.runtime import setup_runtime  # noqa: E402


def main():
    setup_runtime()
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import (
        encode_text,
        frame_bucket,
        predict_lengths,
        synthesize_to_wav,
        synthesize_to_wav_from_encoding,
    )
    from arttts_tpu.models.hifigan import HiFiGANGenerator
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.ops.shape import fix_len_compatibility

    cfg = get_preset("v2")
    model = GradTTSModel(config=cfg.model)
    B, T_x = 1, 96
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(1, cfg.model.encoder.n_vocab, size=(B, T_x)))
    x_lengths = jnp.array([T_x] * B, dtype=jnp.int32)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        x, x_lengths,
        jnp.asarray(rng.standard_normal((B, 64, cfg.model.n_feats)), jnp.float32),
        jnp.ones((B, 64, 1)), jnp.zeros((B,)),
    )
    vocoder = HiFiGANGenerator()
    voc_vars = jax.jit(vocoder.init)(
        jax.random.PRNGKey(1), jnp.zeros((B, 768, 80))
    )

    base_key = jax.random.PRNGKey(1)
    _, _, _, pred0 = encode_text(model, variables, x, x_lengths)
    pred = int(np.ceil(float(jnp.max(pred0))))
    auto_bucket = frame_bucket(fix_len_compatibility(pred))
    buckets = [int(a) for a in sys.argv[1:]] or [auto_bucket]
    print(f"predicted {pred} frames -> auto bucket {auto_bucket}")

    for bucket in buckets:
        audio_s = pred * 256 / 22050.0 if bucket == auto_bucket else bucket * 256 / 22050.0

        def run_old(k):
            predict_lengths(model, variables, x, x_lengths)
            return synthesize_to_wav(
                model, variables, vocoder, voc_vars, k, x, x_lengths,
                n_timesteps=50, max_frames=bucket,
            )

        def run_new(k):
            mu_x, logw, x_mask, _ = encode_text(model, variables, x, x_lengths)
            return synthesize_to_wav_from_encoding(
                model, variables, vocoder, voc_vars, k, mu_x, logw, x_mask,
                n_timesteps=50, max_frames=bucket,
            )

        for name, run in [("old(2xenc)", run_old), ("new(split)", run_new)]:
            t0 = time.perf_counter()
            out = run(base_key)
            float(jnp.sum(out[0]))
            print(f"  bucket {bucket} {name}: compile {time.perf_counter()-t0:.1f}s")
            el, out = differential_time(run, base_key, repeats=3)
            frames = max(int(np.asarray(out[1]).max()), 1)
            rtf = el / (frames * 256 / 22050.0)
            print(
                f"  bucket {bucket} {name}: {el*1000:.2f} ms, frames {frames},"
                f" rtf {rtf:.5f} (bucket-rtf {el/(bucket*256/22050.0):.5f})"
            )


if __name__ == "__main__":
    main()
