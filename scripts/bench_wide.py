"""Hardware timing of the WIDE fused ResnetBlock2d kernel at the exact
geometries the fast U-Net loop uses (models/unet2d_fast.py), vs the XLA
module path and the bf16 dot roofline.  Parity is checked on-device
against the module (bf16-dot tolerance).

Usage: python scripts/bench_wide.py [--only rb11]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def diff_time(run, n_small=3, n_large=23, repeats=5):
    def timed(n):
        float(jnp.sum(run()))
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run()
        float(jnp.sum(out))
        return time.perf_counter() - t0

    timed(n_small)
    diffs = sorted(timed(n_large) - timed(n_small) for _ in range(repeats))
    return diffs[len(diffs) // 2] / (n_large - n_small)


# in-loop wide geometries: name -> (H, T, c_chunks, c_out, real64, attn)
GEOMS = {
    "rb3":  (40, 384, (128,), 128, False, True),
    "rb5":  (20, 192, (256,), 256, False, True),
    "rb7":  (20, 192, (256,), 256, False, False),
    "rb8":  (20, 192, (256, 256), 128, False, False),
    "rb10": (40, 384, (128, 128), 64, True, False),
    "rb11": (40, 384, (64,), 64, True, True),
}


def dot_roofline_us(H, T, c_chunks, c_out, real64, attn, peak_tflops=197.0):
    """bf16 MXU-bound time of the dots the kernel actually issues (padded
    widths included: real64 dots run at K/N = 128)."""
    lanes = 128 if real64 else c_out
    L = T + 16
    fl = 0
    # conv1: 9 dots per input chunk at (H*L, cw) x (cw, lanes)
    for cw in c_chunks:
        cwp = 128 if (real64 and cw == 64) else cw
        fl += 9 * H * L * cwp * lanes * 2
    # conv2: 9 dots (lanes -> lanes)
    fl += 9 * H * L * lanes * lanes * 2
    # residual dense (if not identity)
    if tuple(c_chunks) != (c_out,):
        for cw in c_chunks:
            cwp = 128 if (real64 and cw == 64) else cw
            fl += H * T * cwp * lanes * 2
    if attn:
        # k, v, q, proj projections + ctx + out contraction (HD=128)
        npar = max(1, lanes // 128) if not real64 else 1
        fl += npar * 6 * H * T * lanes * 128 * 2
    return fl / (peak_tflops * 1e12) * 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None)
    p.add_argument("--no-xla", action="store_true")
    args = p.parse_args()

    from arttts_tpu.core.runtime import setup_runtime

    setup_runtime()
    from arttts_tpu.models.unet2d import LinearAttention2d, ResnetBlock2d
    from arttts_tpu.ops.resblock2d_pallas import (
        pack_attn_params_wide, pack_resblock_params_wide, pad_wide,
        resblock2d_wide, unpad_wide,
    )

    B = 1
    for name, (H, T, c_chunks, c_out, real64, attn) in GEOMS.items():
        if args.only and name != args.only:
            continue
        c_in = sum(c_chunks)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((B, H, T, c_in)).astype(np.float32)
        )
        mask = jnp.ones((B, 1, T, 1), jnp.float32)
        temb = jnp.asarray(
            rng.standard_normal((B, 64)).astype(np.float32) * 0.3
        )

        mod = ResnetBlock2d(dim_out=c_out, masked_norm=True)
        variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, mask, temb)
        prm = variables["params"]
        amod = aprm = g = None
        if attn:
            amod = LinearAttention2d()
            avars = jax.jit(amod.init)(
                jax.random.PRNGKey(1),
                jnp.zeros((B, H, T, c_out), jnp.float32),
            )
            aprm = avars["params"]
            g = jnp.asarray(0.37, jnp.float32)

        def mod_fwd(x_, t_):
            y = mod.apply(variables, x_, mask, t_)
            if attn:
                y = y + g * amod.apply(avars, y)
            return y

        mod_jit = jax.jit(mod_fwd)
        ref = mod_jit(x, temb)
        t_xla = None
        if not args.no_xla:
            t_xla = diff_time(lambda: mod_jit(x, temb))

        # kernel inputs: the block applies mish to temb then Dense_0
        def _mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        tv = _mish(temb) @ prm["Dense_0"]["kernel"] + prm["Dense_0"]["bias"]
        if real64:
            tv = jnp.pad(tv, ((0, 0), (0, 128 - c_out)))
        offs = np.cumsum((0,) + tuple(c_chunks))
        xs = tuple(
            pad_wide(x[..., offs[j]: offs[j + 1]])
            for j in range(len(c_chunks))
        )
        if real64:
            xs = tuple(
                jnp.pad(xw, ((0, 0),) * 3 + ((0, 128 - xw.shape[-1]),))
                if xw.shape[-1] < 128 else xw
                for xw in xs
            )
        kpar = pack_resblock_params_wide(
            prm, c_chunks, c_out, real64=real64,
        )
        apar = None
        if attn:
            apar = pack_attn_params_wide(aprm, g, real64=real64)
        lens = jnp.full((B,), T, jnp.int32)

        run = jax.jit(
            lambda xs_, tv_: resblock2d_wide(
                xs_, lens, tv_, kpar, c_out=c_out, c_chunks=c_chunks,
                real64=real64, attn_params=apar,
            ),
            static_argnames=(),
        )
        t0 = time.time()
        out = run(xs, tv)
        got = unpad_wide(out)[..., :c_out]
        err = float(
            jnp.max(jnp.abs(got - ref))
            / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6)
        )
        dt_compile = time.time() - t0
        t_pal = diff_time(lambda: run(xs, tv))
        bound = dot_roofline_us(H, T, c_chunks, c_out, real64, attn)
        xla_s = f"xla {t_xla*1e6:7.1f} us, " if t_xla else ""
        print(
            f"{name:5s} H={H:3d} T={T} cin={c_in:3d} cout={c_out:3d}"
            f"{' r64' if real64 else '    '}{' +attn' if attn else '      '}"
            f": {xla_s}pallas {t_pal*1e6:7.1f} us "
            f"(bound {bound:5.1f} us, {bound/t_pal/1e6*100:4.1f}% MXU), "
            f"rel err {err:.2e}, compile {dt_compile:.0f}s"
        )


if __name__ == "__main__":
    main()
