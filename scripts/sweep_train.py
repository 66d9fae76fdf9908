"""Training-throughput sweep (VERDICT r4 #5): one measured push on train MFU.

Sweeps the v1 recipe's training step over
  - K (steps per dispatch: 1 via make_train_step, else make_train_multistep)
  - B (batch size)
  - decoder compute dtype (f32 vs bf16 activations in the U-Net body)
and reports ms/step + MFU (XLA cost_analysis FLOPs of the f32 single-step
program as the model-cost denominator, held fixed across variants so MFU
stays comparable — bf16 does not change the math, only the precision).

Run on the real chip:  python scripts/sweep_train.py [--quick]

r4 baseline (CLAUDE.md): K=8 B=16 f32 = 5.97 ms/step, train MFU 0.135;
single-step 11.38-13.15 ms (dispatch-bound); device busy is HBM-bound
(525 GB/s = 64% peak, reduce 1.43 ms + copy/layout 0.84 ms per step).
"""

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

V5E_PEAK_FLOPS = 197e12


def differential_time(run, base_key, n_small=1, n_large=4, repeats=3):
    def timed(n):
        keys = [jax.random.fold_in(base_key, i) for i in range(n)]
        float(jnp.sum(keys[-1]))
        t0 = time.perf_counter()
        out = None
        for k in keys:
            out = run(k)
        float(jnp.sum(out[0]))
        return time.perf_counter() - t0

    timed(n_small)
    diffs = []
    for _ in range(repeats):
        t1 = timed(n_small)
        t2 = timed(n_large)
        diffs.append(t2 - t1)
    diffs.sort()
    return diffs[len(diffs) // 2] / (n_large - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="K in {8}, B in {16}")
    ap.add_argument("--ks", type=int, nargs="*", default=[1, 8, 16, 32])
    ap.add_argument("--bs", type=int, nargs="*", default=[16, 32])
    ap.add_argument("--dtypes", nargs="*", default=["float32", "bfloat16"])
    args = ap.parse_args()
    if args.quick:
        args.ks, args.bs = [8], [16]

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.core.runtime import setup_runtime
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.train.step import (
        create_train_state,
        make_train_multistep,
        make_train_step,
    )

    setup_runtime()
    cfg1 = get_preset("v1")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    base_key = jax.random.PRNGKey(1)
    Txt, Tyt = 192, 768

    results = []
    flops_by_b = {}
    for Bt in args.bs:
        xt = jnp.asarray(
            rng.integers(-1, 2, size=(Bt, Txt, cfg1.model.encoder.n_input_feats))
            .astype(np.float32)
        )
        xlt = jnp.full((Bt,), Txt, jnp.int32)
        yt = jnp.asarray(
            rng.standard_normal((Bt, Tyt, cfg1.model.n_feats)).astype(np.float32)
        )
        ylt = jnp.full((Bt,), Tyt, jnp.int32)
        batch = {"x": xt, "x_lengths": xlt, "y": yt, "y_lengths": ylt}

        for dt in args.dtypes:
            mcfg = dataclasses.replace(
                cfg1.model,
                decoder=dataclasses.replace(
                    cfg1.model.decoder, compute_dtype=dt
                ),
            )
            m1 = GradTTSModel(config=mcfg)
            v1vars = jax.jit(m1.init)(
                {"params": key, "dropout": key},
                xt, xlt, yt[:, :64], jnp.ones((Bt, 64, 1)), jnp.zeros((Bt,)),
            )
            state = create_train_state(
                m1, v1vars, cfg1.train.learning_rate, cfg1.train.grad_clip_norm
            )

            for K in args.ks:
                label = f"B={Bt:2d} K={K:2d} {dt[:4]}"
                try:
                    if K == 1:
                        step = make_train_step(
                            m1, out_size=cfg1.train.out_size, donate=False
                        )

                        def run(k, _step=step, _state=state, _batch=batch):
                            _, met = _step(_state, k, _batch)
                            return (met["total_loss"],)
                    else:
                        multi = make_train_multistep(
                            m1, out_size=cfg1.train.out_size, n_steps=K,
                            donate=False,
                        )
                        batches_m = jax.tree_util.tree_map(
                            lambda a: jnp.stack([a] * K), batch
                        )

                        def run(k, _m=multi, _state=state, _b=batches_m):
                            _, met = _m(_state, k, _b)
                            return (met["total_loss"][-1],)

                    t0 = time.perf_counter()
                    float(jnp.sum(run(base_key)[0]))
                    t_compile = time.perf_counter() - t0
                    per_launch = differential_time(run, base_key)
                    per_step = per_launch / K
                    # model FLOPs: f32 single-step cost analysis per B
                    if Bt not in flops_by_b and dt == "float32" and K == 1:
                        cost = step.lower(state, base_key, batch).compile(
                        ).cost_analysis()
                        if isinstance(cost, list):
                            cost = cost[0]
                        flops_by_b[Bt] = float(cost.get("flops", 0.0))
                    fl = flops_by_b.get(Bt, 0.0)
                    mfu = fl / per_step / V5E_PEAK_FLOPS if fl else float("nan")
                    results.append((label, per_step * 1e3, mfu))
                    print(
                        f"{label}: {per_step*1e3:7.2f} ms/step "
                        f"({1.0/per_step:6.1f} steps/s, MFU {mfu:.4f}) "
                        f"[compile {t_compile:.0f}s]",
                        flush=True,
                    )
                except Exception as e:
                    print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)

    print("\n=== summary (sorted by ms/step) ===")
    for label, ms, mfu in sorted(results, key=lambda r: r[1]):
        print(f"{label}: {ms:7.2f} ms/step  MFU {mfu:.4f}")


if __name__ == "__main__":
    main()
