"""Trace + roofline the canonical training step on the real TPU (r4 task 2).

The reference's dominant workload is the v1 training loop
(`/root/reference/src/train.py:166-184`: encoder fwd, MAS, 2 s segment cut,
U-Net fwd/bwd, clip, Adam at batch 16) — bench scenario 6 times it but
nothing ever traced it. This script measures the step differentially,
computes train MFU from XLA's cost_analysis (the whole step is XLA today:
the fused Pallas U-Net kernels are forward-only, so training runs the module
path and cost_analysis sees every op), captures a device trace, and prints
the leaf-op breakdown via `utils/trace_analysis.py`.

Usage: python scripts/profile_train.py [--batch 16] [--trace-dir /tmp/train_trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tx", type=int, default=192)
    p.add_argument("--ty", type=int, default=768)
    p.add_argument("--preset", default="v1")
    p.add_argument("--trace-dir", default="/tmp/train_trace")
    p.add_argument("--hlo", action="store_true")
    p.add_argument("--no-trace", action="store_true")
    args = p.parse_args()

    from arttts_tpu.core.runtime import setup_runtime

    setup_runtime()
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.train.step import create_train_state, make_train_step

    cfg = get_preset(args.preset)
    model = GradTTSModel(config=cfg.model)
    Bt, Txt, Tyt = args.batch, args.tx, args.ty
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    if getattr(cfg.model.encoder, "n_input_feats", 0):
        xt = jnp.asarray(
            rng.integers(-1, 2, size=(Bt, Txt, cfg.model.encoder.n_input_feats))
            .astype(np.float32)
        )
    else:
        xt = jnp.asarray(
            rng.integers(1, cfg.model.encoder.n_vocab, size=(Bt, Txt))
        )
    xlt = jnp.full((Bt,), Txt, jnp.int32)
    yt = jnp.asarray(
        rng.standard_normal((Bt, Tyt, cfg.model.n_feats)).astype(np.float32)
    )
    ylt = jnp.full((Bt,), Tyt, jnp.int32)
    v1vars = jax.jit(model.init)(
        {"params": key, "dropout": key},
        xt, xlt, yt[:, :64], jnp.ones((Bt, 64, 1)), jnp.zeros((Bt,)),
    )
    state = create_train_state(
        model, v1vars, cfg.train.learning_rate, cfg.train.grad_clip_norm
    )
    step = make_train_step(model, out_size=cfg.train.out_size, donate=False)
    batch = {"x": xt, "x_lengths": xlt, "y": yt, "y_lengths": ylt}

    base_key = jax.random.PRNGKey(1)

    def run(k):
        _, metrics = step(state, k, batch)
        return metrics["total_loss"]

    t0 = time.perf_counter()
    out = run(base_key)
    float(out)
    print(f"compiled in {time.perf_counter()-t0:.1f}s; loss {float(out):.4f}")

    lowered = step.lower(state, base_key, batch)
    compiled = lowered.compile()
    if args.hlo:
        txt = compiled.as_text()
        open("/tmp/train_hlo.txt", "w").write(txt)
        print("HLO -> /tmp/train_hlo.txt", len(txt), "bytes")
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    def timed(n):
        keys = [jax.random.fold_in(base_key, i) for i in range(n)]
        float(jnp.sum(keys[-1]))
        t0 = time.perf_counter()
        o = None
        for k in keys:
            o = run(k)
        float(o)
        return time.perf_counter() - t0

    timed(2)
    n1, n2, reps = 2, 12, 5
    diffs = sorted(timed(n2) - timed(n1) for _ in range(reps))
    per_step = diffs[reps // 2] / (n2 - n1)
    print(
        f"train step B={Bt}: {per_step*1e3:.2f} ms "
        f"({1.0/per_step:.1f} steps/s)"
    )
    print(
        f"flops {flops/1e9:.1f} G -> {flops/per_step/1e12:.2f} TFLOP/s "
        f"(MFU {flops/per_step/V5E_PEAK_FLOPS:.3f}); "
        f"bytes {bytes_acc/1e6:.0f} MB -> {bytes_acc/per_step/1e9:.0f} GB/s "
        f"(HBM {bytes_acc/per_step/V5E_PEAK_HBM:.3f})"
    )

    if args.no_trace:
        return
    jax.profiler.start_trace(args.trace_dir)
    o = run(base_key)
    float(o)
    jax.profiler.stop_trace()
    print("trace ->", args.trace_dir)

    from arttts_tpu.utils.trace_analysis import (
        device_busy_seconds, grouped_report, leaf_op_table,
    )

    busy = device_busy_seconds(args.trace_dir)
    print(f"device busy {busy*1e3:.2f} ms (window includes 1 step + fetch)")
    groups = {
        "conv": ("conv",),
        "dot": ("dot", "gemm"),
        "copy/layout": ("copy", "bitcast", "transpose", "reshape", "pad"),
        "mas": ("mas", "custom-call"),
        "scatter/gather": ("scatter", "gather", "dynamic"),
        "reduce": ("reduce", "all-reduce"),
        "select/cmp": ("select", "compare"),
    }
    print("grouped leaf-op device ms:", grouped_report(args.trace_dir, groups))
    print("top 40 leaf ops (name, total_ms, count):")
    for name, ms, cnt in leaf_op_table(args.trace_dir)[:40]:
        print(f"  {ms:9.3f} ms x{cnt:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
