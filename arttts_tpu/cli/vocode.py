"""Vocoding CLI — `vocoder_inference.py` / `hifigan_inference_ms.py`
equivalents:

    # mel -> wav with a converted hifigan.pt
    python -m arttts_tpu.cli.vocode --mode mel --torch-ckpt hifigan.pt \
        --pred-dir preds/v2 --save-dir wavs/v2

    # articulatory -> wav with a converted sparc_*.ckpt
    python -m arttts_tpu.cli.vocode --mode sparc --torch-ckpt sparc_en.ckpt \
        --pred-dir preds/v1 --save-dir wavs/v1 --spk-ft spk.npy \
        --pitch-stats 120.0 30.0
"""

from __future__ import annotations

import argparse
import logging

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", choices=["mel", "sparc"], required=True)
    parser.add_argument("--torch-ckpt", required=True)
    parser.add_argument("--pred-dir", required=True)
    parser.add_argument("--save-dir", required=True)
    parser.add_argument("--spk-ft", help="speaker pre-embedding npy (sparc mode)")
    parser.add_argument("--pitch-stats", nargs=2, type=float, default=[0.0, 1.0],
                        metavar=("MU", "STD"))
    parser.add_argument("--loudness-stats", nargs=2, type=float, default=None)
    parser.add_argument("--sample-rate", type=int)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from arttts_tpu.core.runtime import setup_runtime
    setup_runtime()

    import torch
    from pathlib import Path

    artifacts = sorted(str(p) for p in Path(args.pred_dir).glob("*.npy"))
    if args.mode == "mel":
        from arttts_tpu.models.hifigan import HiFiGANGenerator
        from arttts_tpu.infer.pipeline import run_mel_vocoder
        from arttts_tpu.utils.torch_convert import convert_hifigan_generator

        ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
        sd = ckpt.get("generator", ckpt)
        gen = HiFiGANGenerator()
        params = convert_hifigan_generator(sd)
        out = run_mel_vocoder(
            gen, {"params": params}, artifacts, args.save_dir,
            sample_rate=args.sample_rate or 22050,
        )
    else:
        from arttts_tpu.models.hifigan import SpkSparcHiFiGANGenerator
        from arttts_tpu.infer.pipeline import run_sparc_vocoder
        from arttts_tpu.utils.torch_convert import convert_spk_sparc

        ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
        gen = SpkSparcHiFiGANGenerator()
        params = convert_spk_sparc(ckpt)
        spk_ft = np.load(args.spk_ft)
        out = run_sparc_vocoder(
            gen,
            {"params": params},
            artifacts,
            spk_ft,
            args.save_dir,
            pitch_stats=tuple(args.pitch_stats),
            loudness_stats=tuple(args.loudness_stats) if args.loudness_stats else None,
            sample_rate=args.sample_rate or ckpt.get("config", {}).get("sr", 16000),
        )
    logging.info("wrote %d wavs to %s", len(out), args.save_dir)


if __name__ == "__main__":
    main()
