"""Acoustic inference CLI — the `arttts_inference.py` equivalent:

    python -m arttts_tpu.cli.synthesize --preset v2 --ckpt logs/v2/grad_best \
        --filelist lists/test.txt --data-root /data --save-dir preds/v2

Writes the (29|161, T) per-sample npy artifacts consumed by the vocoder and
quanti stages.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="v2")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--data-root", default=".")
    parser.add_argument("--cmudict")
    parser.add_argument("--artic-dir")
    parser.add_argument("--mel-cache")
    parser.add_argument("--save-dir", required=True)
    parser.add_argument("--n-timesteps", type=int, default=50)
    parser.add_argument("--solver", choices=["euler", "heun", "dpm"],
                        default="euler",
                        help="heun: 2nd-order ODE solver (2 evals/step); "
                             "dpm: DPM-Solver++(2M), 1 eval/step — fewest "
                             "evals for the same ODE solution")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument("--use-align", action="store_true",
                        help="use ground-truth phnm3 durations (x_durations)")
    parser.add_argument("--batch-size", type=int, default=1,
                        help=">1 uses batched serving mode (masked-norm model)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from arttts_tpu.core.runtime import setup_runtime
    setup_runtime()

    from arttts_tpu.cli.train import build_dataset
    from arttts_tpu.core.checkpoint import load_checkpoint
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.pipeline import (
        run_acoustic_inference,
        run_acoustic_inference_batched,
    )

    cfg = get_preset(args.preset)
    dataset = build_dataset(cfg, args, args.filelist)
    restored = load_checkpoint(args.ckpt)
    variables = {"params": restored["params"]}
    if args.batch_size > 1:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                decoder=dataclasses.replace(cfg.model.decoder, masked_norm=True),
            ),
        )
        paths = run_acoustic_inference_batched(
            cfg, variables, dataset, args.save_dir,
            batch_size=args.batch_size, n_timesteps=args.n_timesteps,
            temperature=args.temperature,
        )
    else:
        paths = run_acoustic_inference(
            cfg,
            variables,
            dataset,
            args.save_dir,
            n_timesteps=args.n_timesteps,
            temperature=args.temperature,
            length_scale=args.length_scale,
            use_align=args.use_align,
            solver=args.solver,
        )
    logging.info("saved %d artifacts to %s", len(paths), args.save_dir)


if __name__ == "__main__":
    main()
