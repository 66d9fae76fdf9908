"""Capture a device trace of the B=1 50-step diffusion loop on the real TPU.

Usage (through the axon tunnel):
    python scripts/profile_unet.py [--steps 50] [--trace-dir /tmp/unet_trace]

Produces a perfetto trace (trace.json.gz) with per-op device times; correlate
op names against `jit(f).lower(...).compile().as_text()` HLO. Used to verify
the HBM-roofline claim in CLAUDE.md and to find the next fusion target.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--trace-dir", default="/tmp/unet_trace")
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--hlo", action="store_true", help="dump compiled HLO text")
    args = p.parse_args()

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import reverse_diffusion
    from arttts_tpu.models.tts import GradTTSModel

    cfg = get_preset("v2")
    model = GradTTSModel(config=cfg.model)
    B, T, F = args.batch, args.frames, cfg.model.n_feats
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.integers(1, cfg.model.encoder.n_vocab, size=(B, 24)))
    xl = jnp.array([24] * B, jnp.int32)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key}, x, xl,
        jnp.zeros((B, 64, F)), jnp.ones((B, 64, 1)), jnp.zeros((B,)),
    )

    mu = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)

    run = jax.jit(
        lambda v, z_, m_, mu_: reverse_diffusion(
            model, v, z_, m_, mu_, args.steps
        )
    )
    if args.hlo:
        txt = run.lower(variables, z, mask, mu).compile().as_text()
        open("/tmp/unet_hlo.txt", "w").write(txt)
        print("HLO ->", "/tmp/unet_hlo.txt", len(txt), "bytes")

    out = run(variables, z, mask, mu)
    print("compiled; warm value", float(jnp.sum(out)))

    # timed (differential, fetch-fenced).  The fetch round-trip through
    # the tunnel is 30-900 ms noisy and each leg carries exactly one, so
    # a single (t_large - t_small) can be off by ~1 s: take the median of
    # several alternating diffs instead (an r3 session measured the same
    # program at 37 and 109 ms/50-step from one-shot diffs).
    def timed(n):
        float(jnp.sum(run(variables, z, mask, mu)))  # fence queue
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = run(variables, z, mask, mu)
        float(jnp.sum(o))
        return time.perf_counter() - t0

    timed(2)
    n1, n2, reps = 2, 12, 5
    diffs = sorted(timed(n2) - timed(n1) for _ in range(reps))
    per_iter = diffs[reps // 2] / (n2 - n1)
    print(f"{args.steps}-step loop: {per_iter*1e3:.2f} ms "
          f"({per_iter/args.steps*1e3:.3f} ms/step)")

    cost = run.lower(variables, z, mask, mu).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = float(cost.get("flops", 0))
    by = float(cost.get("bytes accessed", 0))
    print(f"flops {fl/1e9:.1f} G -> {fl/per_iter/1e12:.2f} TFLOP/s; "
          f"bytes {by/1e6:.0f} MB -> {by/per_iter/1e9:.0f} GB/s")

    jax.profiler.start_trace(args.trace_dir)
    o = run(variables, z, mask, mu)
    float(jnp.sum(o))
    jax.profiler.stop_trace()
    print("trace ->", args.trace_dir)

    from arttts_tpu.utils.trace_analysis import (
        device_busy_seconds, grouped_report, leaf_op_table,
    )

    busy = device_busy_seconds(args.trace_dir)
    print(f"device busy {busy*1e3:.2f} ms (window: 1 loop + fetch)")
    groups = {
        "resblock_kernel": ("resblock",),
        "boundary_kernel": ("downsample", "conv_transpose", "convt", "updown"),
        "conv": ("conv",),
        "dot": ("dot", "gemm"),
        "copy/layout": ("copy", "bitcast", "transpose", "reshape", "pad"),
        "custom-call": ("custom-call",),
        "reduce": ("reduce",),
        "select/cmp": ("select", "compare"),
    }
    print("grouped leaf-op device ms:", grouped_report(args.trace_dir, groups))
    print("top 30 leaf ops (name, total_ms, count):")
    for name, ms, cnt in leaf_op_table(args.trace_dir)[:30]:
        print(f"  {ms:9.3f} ms x{cnt:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
