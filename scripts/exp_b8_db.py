"""Hardware experiments, r5: B=8 decode routing + double-buffered DMA.

1. B=8 50-step loop on the MODULE (XLA) path — if XLA's batched convs beat
   the fast path's 114.7 ms/utt, batched serving should route there
   (the r4 ceiling analysis never measured this arm).
2. B=1 and B=8 fast-path loop with ARTTTS_RB_DB=1 (double-buffered input
   DMA in the resblock kernels) vs the serial-DMA baseline.

Each variant runs in ITS OWN jit trace (env flags are trace-time).
Usage: python scripts/exp_b8_db.py [--only-db | --only-module]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(run, *args, n1=2, n2=8, reps=5):
    def timed(n):
        float(jnp.sum(run(*args)))
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = run(*args)
        float(jnp.sum(o))
        return time.perf_counter() - t0

    timed(2)
    diffs = sorted(timed(n2) - timed(n1) for _ in range(reps))
    return diffs[reps // 2] / (n2 - n1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only-db", action="store_true")
    p.add_argument("--only-module", action="store_true")
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.core.runtime import setup_runtime
    from arttts_tpu.infer.sampler import reverse_diffusion
    from arttts_tpu.models.tts import GradTTSModel

    setup_runtime()
    cfg = get_preset("v2")
    model = GradTTSModel(config=cfg.model)
    T, F = 768, cfg.model.n_feats
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).integers(
            1, cfg.model.encoder.n_vocab, size=(1, 24)
        )
    )
    xl = jnp.array([24], jnp.int32)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key}, x, xl,
        jnp.zeros((1, 64, F)), jnp.ones((1, 64, 1)), jnp.zeros((1,)),
    )

    def data(B):
        r = np.random.default_rng(1)
        mu = jnp.asarray(r.standard_normal((B, T, F)).astype(np.float32))
        z = jnp.asarray(r.standard_normal((B, T, F)).astype(np.float32))
        mask = jnp.ones((B, T, 1), jnp.float32)
        return z, mask, mu

    def loop_time(B, env):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            run = jax.jit(
                lambda v, z_, m_, mu_: reverse_diffusion(
                    model, v, z_, m_, mu_, args.steps
                )
            )
            z, mask, mu = data(B)
            t0 = time.perf_counter()
            float(jnp.sum(run(variables, z, mask, mu)))
            tc = time.perf_counter() - t0
            per = timed_loop(run, variables, z, mask, mu,
                             n2=8 if B == 1 else 4)
            return per, tc
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    if not args.only_db:
        for B in (8,):
            per, tc = loop_time(B, {"ARTTTS_DISABLE_UNET_PALLAS": "1"})
            print(
                f"B={B} MODULE path: {per*1e3:.2f} ms ({per*1e3/B:.2f} ms/utt)"
                f" [compile {tc:.0f}s]", flush=True,
            )

    if not args.only_module:
        for B in (1, 8):
            per, tc = loop_time(B, {"ARTTTS_RB_DB": "1"})
            print(
                f"B={B} fast+DB: {per*1e3:.2f} ms ({per*1e3/B:.2f} ms/utt)"
                f" [compile {tc:.0f}s]", flush=True,
            )
        # VPU floor probe (WRONG NUMERICS, timing only): loop with mish +
        # GroupNorm statistics stubbed out bounds the VPU normalize/
        # activation share of the fast path by difference.
        # NOTE: _NO_VPU is read at io mport in resblock2d_pallas, so this
        # arm only works when the env var is set before Python starts;
        # detect and skip otherwise.
        import arttts_tpu.ops.resblock2d_pallas as rb

        if rb._NO_VPU:
            per, tc = loop_time(1, {})
            print(
                f"B=1 fast NO_VPU floor: {per*1e3:.2f} ms [compile {tc:.0f}s]",
                flush=True,
            )
        else:
            print(
                "NO_VPU probe skipped (set ARTTTS_RB_NO_VPU=1 in the "
                "environment and rerun for the VPU-floor arm)", flush=True,
            )


if __name__ == "__main__":
    main()
