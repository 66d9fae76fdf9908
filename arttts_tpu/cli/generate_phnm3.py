"""Batch phnm3 generation CLI (ref `src/generate_phnm3.py`):

    python -m arttts_tpu.cli.generate_phnm3 --corpus mngu0 \
        --phnm-dir labels/ --save-dir phnm3/
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", required=True,
                        choices=["mngu0", "mocha", "mspka", "pb2007"])
    parser.add_argument("--phnm-dir", required=True)
    parser.add_argument("--save-dir", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("generate_phnm3")

    from arttts_tpu.corpora import get_corpus

    corpus = get_corpus(args.corpus)
    phnm_dir = Path(args.phnm_dir)
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(phnm_dir.glob(f"*{corpus.label_ext}"))
    log.info("found %d label files", len(files))
    for fp in files:
        try:
            phnm3 = corpus.get_phnm3(fp)
            np.save(save_dir / f"{fp.stem}_phnm3.npy", phnm3)
        except Exception as e:  # log-and-continue like the reference
            log.error("error processing %s: %s", fp, e)


if __name__ == "__main__":
    main()
