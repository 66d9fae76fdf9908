"""Micro-benchmarks for the U-Net hot block under dtype/layout variants.

The B=1 50-step loop is bandwidth-bound; the open question (VERDICT r1 weak
#4) is whether bf16 activations can halve HBM traffic without triggering the
(2,1)-tiled-layout pathology measured in round 1 (26x slowdown on the full
U-Net). This times the ONE dominant pattern — conv3x3 -> GroupNorm -> mish
at level-1 U-Net shape (1, 80, 768, C) — under controlled variants:

  f32           baseline (what the model runs today)
  bf16_pure     everything bf16 (round-1 pathology repro)
  bf16_f32gn    bf16 tensors, GroupNorm statistics in f32 (casts around GN)
  bf16_convonly conv in bf16 (bf16 in/out), GN+mish chained in f32
  f32_c128      f32 control at C=128 (full lanes; is C=64 padding the cost?)

Run on the real TPU: `python scripts/dtype_experiments.py`
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def gn_mish(h, scale, bias, groups=8, stat_dtype=None):
    B, H, W, C = h.shape
    G, Cg = groups, C // groups
    xg = h.reshape(B, H, W, G, Cg)
    if stat_dtype is not None:
        xg_s = xg.astype(stat_dtype)
    else:
        xg_s = xg
    mean = jnp.mean(xg_s, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg_s, axis=(1, 2, 4), keepdims=True)
    xg = ((xg_s - mean) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
    h = xg.reshape(B, H, W, C) * scale + bias
    return h * jnp.tanh(jax.nn.softplus(h))


def make_chain(dtype, conv_dtype=None, stat_dtype=None, C=64, n_blocks=6):
    conv_dtype = conv_dtype or dtype
    g = np.random.default_rng(0)
    w = jnp.asarray(g.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05,
                    dtype=conv_dtype)
    scale = jnp.ones((C,), dtype)
    bias = jnp.zeros((C,), dtype)
    dn = jax.lax.conv_dimension_numbers((1, 80, 768, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def block(x):
        h = jax.lax.conv_general_dilated(
            x.astype(conv_dtype), w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        return gn_mish(h, scale, bias, stat_dtype=stat_dtype)

    @jax.jit
    def chain(x):
        for _ in range(n_blocks):
            x = block(x)
        return x

    x0 = jnp.asarray(g.standard_normal((1, 80, 768, C)).astype(np.float32),
                     dtype=dtype)
    return chain, x0


def timeit(fn, x, iters=30):
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + sync

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(x)
        float(jnp.sum(o.astype(jnp.float32)))
        return time.perf_counter() - t0

    run(3)
    t1 = min(run(3) for _ in range(2))
    t2 = min(run(3 + iters) for _ in range(2))
    return (t2 - t1) / iters


def main():
    variants = {
        "f32": dict(dtype=jnp.float32),
        "bf16_pure": dict(dtype=jnp.bfloat16),
        "bf16_f32gn": dict(dtype=jnp.bfloat16, stat_dtype=jnp.float32),
        "bf16_convonly": dict(dtype=jnp.float32, conv_dtype=jnp.bfloat16),
        "f32_c128": dict(dtype=jnp.float32, C=128),
    }
    print(f"devices: {jax.devices()}")
    results = {}
    for name, kw in variants.items():
        chain, x0 = make_chain(**kw)
        dt = timeit(chain, x0)
        C = kw.get("C", 64)
        # bytes: read+write of (1,80,768,C) per block, 6 blocks
        itemsize = np.dtype(
            "float32" if kw["dtype"] == jnp.float32 else "bfloat16"
        ).itemsize if kw["dtype"] != jnp.bfloat16 else 2
        traffic = 2 * 80 * 768 * C * itemsize * 6
        results[name] = dt
        print(f"{name:14s} {dt*1e3:7.3f} ms  (~{traffic/dt/1e9:5.0f} GB/s of "
              f"required bytes)")
    base = results["f32"]
    for name, dt in results.items():
        print(f"{name:14s} speedup vs f32: {base/dt:5.2f}x")


if __name__ == "__main__":
    main()
