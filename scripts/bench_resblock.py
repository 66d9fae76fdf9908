"""Hardware check + timing of the fused ResnetBlock2d kernel vs the XLA
module path at the bench shape (B=1, 80x768, C=64)."""
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
        float(jnp.sum(run()))
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run()
        float(jnp.sum(out))
        return time.perf_counter() - t0

    timed(n_small)
    t1 = min(timed(n_small) for _ in range(repeats))
    t2 = min(timed(n_large) for _ in range(repeats))
    return (t2 - t1) / (n_large - n_small)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=80)
    p.add_argument("--c-in", type=int, default=64)
    args = p.parse_args()

    from arttts_tpu.core.runtime import setup_runtime

    setup_runtime()
    from arttts_tpu.models.unet2d import ResnetBlock2d
    from arttts_tpu.ops.resblock2d_pallas import (
        pack_lane_vec, pack_resblock_params, resblock2d_packed,
        split_pack_image, unpack_image,
    )

    B, H, T, c_in = args.batch, args.height, args.frames, args.c_in
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, T, c_in)).astype(np.float32))
    mask = jnp.ones((B, 1, T, 1), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((B, 64)).astype(np.float32))

    mod = ResnetBlock2d(dim_out=64, masked_norm=True)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, mask, temb)
    mod_apply = jax.jit(lambda v, x_, m_, t_: mod.apply(v, x_, m_, t_))
    ref = mod_apply(variables, x, mask, temb)
    float(jnp.sum(ref))
    t_xla = diff_time(lambda: mod_apply(variables, x, mask, temb))
    print(f"xla module: {t_xla*1e3:.3f} ms")

    prm = variables["params"]
    params = pack_resblock_params(prm, c_in)
    tvec = jnp.tanh(jax.nn.softplus(temb)) * temb
    tvec = tvec @ prm["Dense_0"]["kernel"] + prm["Dense_0"]["bias"]
    tvec = jax.vmap(pack_lane_vec)(tvec)
    xs = split_pack_image(x)
    lens = jnp.full((B,), T, jnp.int32)

    t0 = time.time()
    out_p = resblock2d_packed(xs, lens, tvec, params, c_in=c_in)
    got = unpack_image(out_p)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"pallas compiled+ran in {time.time()-t0:.1f}s, max|err| = {err:.2e}")

    run_p = lambda: resblock2d_packed(xs, lens, tvec, params, c_in=c_in)
    t_pal = diff_time(run_p)
    print(f"pallas fused: {t_pal*1e3:.3f} ms ({t_xla/t_pal:.2f}x)")


if __name__ == "__main__":
    main()
