"""Chained pipeline driver — the local equivalent of the reference's SLURM
dependency DAGs (`src/scripts/ms_chained_inf.sh`: acoustic inference ->
{quanti metrics, vocoding} with `--dependency=afterok`):

    python -m arttts_tpu.cli.pipeline --preset v2 --ckpt logs/v2/grad_best \
        --filelist lists/test.txt --data-root /data --workdir out/v2 \
        --vocoder-ckpt hifigan.pt [--utmos-ckpt utmos.ckpt]

Stages share the same filesystem contracts as the standalone CLIs, so any
stage can be re-run or swapped independently (e.g. by an external
scheduler). A stage failure stops downstream stages, mirroring
`--kill-on-invalid-dep=yes`.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="v2")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--data-root", default=".")
    parser.add_argument("--cmudict")
    parser.add_argument("--artic-dir")
    parser.add_argument("--mel-cache")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--n-timesteps", type=int, default=50)
    parser.add_argument("--vocoder-ckpt")
    parser.add_argument("--spk-ft")
    parser.add_argument("--pitch-stats", nargs=2, type=float, default=[0.0, 1.0])
    parser.add_argument("--utmos-ckpt")
    parser.add_argument("--ref-mel-dir", help="ground-truth mels for quanti_mel")
    parser.add_argument("--ref-art-dir", help="SPARC re-encodings for quanti_art")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from arttts_tpu.core.runtime import setup_runtime
    setup_runtime()
    log = logging.getLogger("pipeline")

    workdir = Path(args.workdir)
    pred_dir = workdir / "preds"
    wav_dir = workdir / "wavs"

    from arttts_tpu.cli import synthesize as synth_cli
    from arttts_tpu.core.config import get_preset

    cfg = get_preset(args.preset)
    is_mel = cfg.model.n_feats == 80

    # stage 1: acoustic inference
    log.info("[1/4] acoustic inference -> %s", pred_dir)
    synth_args = [
        "--preset", args.preset, "--ckpt", args.ckpt, "--filelist", args.filelist,
        "--data-root", args.data_root, "--save-dir", str(pred_dir),
        "--n-timesteps", str(args.n_timesteps),
    ]
    if args.cmudict:
        synth_args += ["--cmudict", args.cmudict]
    if args.artic_dir:
        synth_args += ["--artic-dir", args.artic_dir]
    synth_cli.main(synth_args)

    # stage 2: quanti metrics on the acoustic artifacts
    from arttts_tpu.eval.quanti import quanti_art, quanti_mel

    if is_mel and args.ref_mel_dir:
        log.info("[2/4] quanti_mel")
        quanti_mel(str(pred_dir), args.ref_mel_dir, str(workdir / "quanti_mel.csv"))
    elif (not is_mel) and args.ref_art_dir:
        log.info("[2/4] quanti_art")
        quanti_art(str(pred_dir), args.ref_art_dir, str(workdir / "quanti_art.csv"))
    else:
        log.info("[2/4] quanti skipped (no reference dir)")

    # stage 3: vocoding
    if args.vocoder_ckpt:
        log.info("[3/4] vocoding -> %s", wav_dir)
        from arttts_tpu.cli import vocode as vocode_cli

        voc_args = [
            "--mode", "mel" if is_mel else "sparc",
            "--torch-ckpt", args.vocoder_ckpt,
            "--pred-dir", str(pred_dir), "--save-dir", str(wav_dir),
        ]
        if not is_mel:
            voc_args += ["--spk-ft", args.spk_ft, "--pitch-stats",
                         str(args.pitch_stats[0]), str(args.pitch_stats[1])]
        vocode_cli.main(voc_args)
    else:
        log.info("[3/4] vocoding skipped (no vocoder ckpt)")

    # stage 4: MOS scoring
    if args.utmos_ckpt and args.vocoder_ckpt:
        log.info("[4/4] UTMOS scoring")
        from arttts_tpu.cli import score as score_cli

        score_cli.main([
            "--ckpt", args.utmos_ckpt, "--wav-dir", str(wav_dir),
            "--out-csv", str(workdir / "utmos.csv"),
        ])
    else:
        log.info("[4/4] UTMOS skipped")
    log.info("pipeline complete: %s", workdir)


if __name__ == "__main__":
    main()
