"""Time the FULL 50-step diffusion loop: f32 vs the plumbed bf16 path.

`DecoderConfig.compute_dtype="bfloat16"` keeps params f32, casts activations
once at the U-Net boundary, accumulates every normalization statistic in f32,
and computes the sinusoidal time phases in f32 (bf16 phases at pe_scale=1000
are a multi-radian error — found by the CPU numerics check).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(run, args, iters=8):
    out = run(*args)
    float(jnp.sum(out.astype(jnp.float32)))

    def t(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = run(*args)
        float(jnp.sum(o.astype(jnp.float32)))
        return time.perf_counter() - t0

    t(2)
    t1 = min(t(2) for _ in range(2))
    t2 = min(t(2 + iters) for _ in range(2))
    return (t2 - t1) / iters


def main():
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import reverse_diffusion
    from arttts_tpu.models.tts import GradTTSModel

    cfg = get_preset("v2")
    m32 = GradTTSModel(config=cfg.model)
    cfg16 = dataclasses.replace(
        cfg.model, decoder=dataclasses.replace(
            cfg.model.decoder, compute_dtype="bfloat16")
    )
    m16 = GradTTSModel(config=cfg16)

    B, T, F = 1, 768, cfg.model.n_feats
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(1, cfg.model.encoder.n_vocab, size=(B, 24)))
    xl = jnp.array([24] * B, jnp.int32)
    variables = jax.jit(m32.init)(
        {"params": key, "dropout": key}, x, xl,
        jnp.zeros((B, 64, F)), jnp.ones((B, 64, 1)), jnp.zeros((B,)),
    )
    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)

    run32 = jax.jit(lambda v, z_, m_, mu_: reverse_diffusion(m32, v, z_, m_, mu_, 50))
    dt32 = timeit(run32, (variables, z, mask, mu))
    print(f"f32         : {dt32*1e3:7.2f} ms")

    run16 = jax.jit(lambda v, z_, m_, mu_: reverse_diffusion(m16, v, z_, m_, mu_, 50))
    dt16 = timeit(run16, (variables, z, mask, mu))
    print(f"bf16 plumbed: {dt16*1e3:7.2f} ms  ({dt32/dt16:.2f}x vs f32)")

    o32 = run32(variables, z, mask, mu)
    o16 = run16(variables, z, mask, mu)
    rel = float(jnp.linalg.norm(o16 - o32) / jnp.linalg.norm(o32))
    print(f"50-step output rel err {rel:.4f}")


if __name__ == "__main__":
    main()
