"""Hardware timing for the K-step fused train dispatch (r4 task 2).

Measures make_train_step (one launch per step) vs make_train_multistep
(K steps per launch, lax.scan) on the real TPU at the v1 recipe's B=16.
The r4 single-step trace showed 13.15 ms wall vs ~5.6 ms device busy —
the step is dispatch-bound through the axon tunnel, and scanning K steps
per launch amortizes the host gap to 1/K.

Usage: python scripts/bench_multistep.py [--batch 16] [--k 8]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--tx", type=int, default=192)
    p.add_argument("--ty", type=int, default=768)
    p.add_argument("--preset", default="v1")
    p.add_argument("--skip-single", action="store_true")
    args = p.parse_args()

    from arttts_tpu.core.runtime import setup_runtime

    setup_runtime()
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.train.step import (
        create_train_state,
        make_train_multistep,
        make_train_step,
    )

    cfg = get_preset(args.preset)
    model = GradTTSModel(config=cfg.model)
    Bt, Txt, Tyt, K = args.batch, args.tx, args.ty, args.k
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
    batch = {"x": xt, "x_lengths": xlt, "y": yt, "y_lengths": ylt}
    base_key = jax.random.PRNGKey(1)

    def timed(run, n, fetch):
        keys = [jax.random.fold_in(base_key, i) for i in range(n)]
        float(jnp.sum(keys[-1]))
        t0 = time.perf_counter()
        o = None
        for k in keys:
            o = run(k)
        fetch(o)
        return time.perf_counter() - t0

    def diff_time(run, fetch, n1, n2, reps=5):
        timed(run, 1, fetch)
        diffs = sorted(
            timed(run, n2, fetch) - timed(run, n1, fetch) for _ in range(reps)
        )
        return diffs[reps // 2] / (n2 - n1)

    if not args.skip_single:
        step = make_train_step(model, out_size=cfg.train.out_size, donate=False)

        def run1(k):
            _, met = step(state, k, batch)
            return met["total_loss"]

        t0 = time.perf_counter()
        float(run1(base_key))
        print(f"single-step compiled in {time.perf_counter()-t0:.1f}s")
        per1 = diff_time(run1, lambda o: float(o), 2, 12)
        print(f"single-step B={Bt}: {per1*1e3:.2f} ms ({1/per1:.1f} steps/s)")

    multi = make_train_multistep(
        model, out_size=cfg.train.out_size, n_steps=K, donate=False
    )
    batches = jax.tree_util.tree_map(lambda a: jnp.stack([a] * K), batch)

    def runm(k):
        _, met = multi(state, k, batches)
        return met["total_loss"]

    t0 = time.perf_counter()
    out = runm(base_key)
    float(jnp.sum(out))
    print(f"multistep K={K} compiled in {time.perf_counter()-t0:.1f}s; "
          f"losses {np.asarray(out)[:3]}")
    perm = diff_time(runm, lambda o: float(jnp.sum(o)), 1, 4)
    per_step = perm / K
    print(
        f"multistep K={K} B={Bt}: {perm*1e3:.2f} ms/launch -> "
        f"{per_step*1e3:.2f} ms/step ({1/per_step:.1f} steps/s)"
    )
    flops = 158.2e9 * Bt / 16  # r4 cost_analysis at B=16 (profile_train.py)
    print(f"train MFU at that rate: {flops/per_step/V5E_PEAK_FLOPS:.3f}")


if __name__ == "__main__":
    main()
