"""UTMOS batch scoring CLI — `UTMOS-demo/predict.py` equivalent:

    python -m arttts_tpu.cli.score --ckpt epoch=3-step=7459.ckpt \
        --wav-dir wavs/v2 --out-csv scores.csv --bs 32
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True, help="UTMOS lightning ckpt")
    parser.add_argument("--wav-dir", required=True)
    parser.add_argument("--out-csv", required=True)
    parser.add_argument("--bs", type=int, default=32)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from arttts_tpu.core.runtime import setup_runtime
    setup_runtime()

    from arttts_tpu.eval.utmos_scorer import UTMOSScorer

    scorer = UTMOSScorer.from_lightning_checkpoint(args.ckpt)
    results = scorer.score_directory(args.wav_dir, args.out_csv, batch_size=args.bs)
    if results:
        mean = sum(results.values()) / len(results)
        logging.info("scored %d files, mean MOS %.3f", len(results), mean)


if __name__ == "__main__":
    main()
