"""Time the HiFi-GAN vocoder paths on the real TPU (through the axon tunnel).

Compares, at the bench shapes (B=1, 768 mel frames -> 196608 samples):
  * the XLA module path (`HiFiGANGenerator.apply`)
  * the Pallas fast path (`hifigan_forward_fast`) at the current gates

Env knobs (read at trace time):
  ARTTTS_MRF_TILE=<rows>     override the MRF kernel's packed-row tile
  ARTTTS_PACKED_CHAIN=1      enable the stage-chained packed upsample path
  ARTTTS_DISABLE_MRF_PALLAS  (not consulted here; this script calls the
                              fast path explicitly)

Timing is differential fetch-synced (CLAUDE.md: block_until_ready does not
synchronize through the tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def diff_time(run, n_small=3, n_large=23, repeats=3):
    def timed(n):
        float(jnp.sum(run()))  # fence queue
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run()
        float(jnp.sum(out))
        return time.perf_counter() - t0

    timed(n_small)  # warm
    t1 = min(timed(n_small) for _ in range(repeats))
    t2 = min(timed(n_large) for _ in range(repeats))
    return (t2 - t1) / (n_large - n_small)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--paths", default="fast,xla")
    args = p.parse_args()

    from arttts_tpu.core.runtime import setup_runtime

    setup_runtime()
    from arttts_tpu.models.hifigan import HiFiGANGenerator, hifigan_forward_fast

    vocoder = HiFiGANGenerator()
    mel = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((args.batch, args.frames, 80))
        .astype(np.float32)
    )
    voc_vars = vocoder.init(jax.random.PRNGKey(1), mel)

    import arttts_tpu.ops.upsample_pallas as ups

    print(
        f"backend={jax.default_backend()} frames={args.frames} B={args.batch} "
        f"tile_env={os.environ.get('ARTTTS_MRF_TILE', '(auto)')} "
        f"packed_chain={ups.ENABLE_PACKED_CHAIN}"
    )

    runs = {}
    if "fast" in args.paths:
        fast = jax.jit(lambda v, m: hifigan_forward_fast(vocoder, v, m))
        runs["fast(pallas)"] = lambda: fast(voc_vars, mel)
    if "xla" in args.paths:
        xla = jax.jit(lambda v, m: vocoder.apply(v, m))
        runs["xla(module)"] = lambda: xla(voc_vars, mel)

    outs = {}
    for name, run in runs.items():
        t0 = time.time()
        outs[name] = run()
        float(jnp.sum(outs[name]))
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s")
    if len(outs) == 2:
        a, b = outs.values()
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"max |fast - xla| = {err:.2e}")
    for name, run in runs.items():
        dt = diff_time(run)
        print(f"{name}: {dt * 1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
