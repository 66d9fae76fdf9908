"""Offline SPARC feature extraction driver (sharded).

Equivalent of `/root/reference/src/encode_audio_voxcom.py` /
`src/scripts/encode_audio.py`: run the external SPARC coder
(`speech-articulatory-coding`) over a wav manifest, saving
`emasrc/{id}.npy` (14-ch features), `spk_emb/` and — for the multilingual
path — 1024-d `spk_preemb/` vectors (the reference disables the final
speaker projection, encode_audio_voxcom.py:68-70).

Sharding: `--shard-id/--num-shards` split the manifest exactly like the
reference's SLURM array jobs (`SLURM_ARRAY_TASK_ID`); shard ids also come
from env vars so `sbatch --array` or any scheduler can drive it unchanged.

The `sparc` package is an optional external dependency; without it this CLI
reports what it would process (the framework consumes the produced npys,
it does not reimplement the coder).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--manifest", required=True,
                        help="voxcommunis tsv manifest or filelist of wavs")
    parser.add_argument("--save-dir", required=True)
    parser.add_argument("--sparc-ckpt", default="sparc_multi.ckpt")
    parser.add_argument("--shard-id", type=int,
                        default=int(os.environ.get("SLURM_ARRAY_TASK_ID", 0)))
    parser.add_argument("--num-shards", type=int,
                        default=int(os.environ.get("SLURM_ARRAY_TASK_COUNT", 1)))
    parser.add_argument("--spk-preemb", action="store_true",
                        help="save 1024-d pre-projection speaker embeddings")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("encode_audio")

    if args.manifest.endswith(".tsv"):
        from arttts_tpu.voxcommunis.io import read_manifest

        entries = [(k, str(v[0])) for k, v in read_manifest(args.manifest).items()]
    else:
        from arttts_tpu.data.filelist import parse_filelist

        entries = [
            (Path(row[0]).stem, row[0]) for row in parse_filelist(args.manifest)
        ]
    shard = entries[args.shard_id :: args.num_shards]
    log.info(
        "shard %d/%d: %d of %d files",
        args.shard_id, args.num_shards, len(shard), len(entries),
    )

    save_dir = Path(args.save_dir)
    (save_dir / "emasrc").mkdir(parents=True, exist_ok=True)
    (save_dir / "spk_emb").mkdir(exist_ok=True)
    if args.spk_preemb:
        (save_dir / "spk_preemb").mkdir(exist_ok=True)

    if args.dry_run:
        for fid, path in shard:
            log.info("would encode %s -> %s", path, save_dir / "emasrc" / f"{fid}.npy")
        return

    try:
        from sparc import load_model  # external speech-articulatory-coding
    except ImportError as e:
        raise SystemExit(
            "the external `sparc` coder package is required for feature "
            "extraction (pip package speech-articulatory-coding); use "
            "--dry-run to validate sharding without it"
        ) from e

    coder = load_model(ckpt=args.sparc_ckpt)
    if args.spk_preemb and hasattr(coder, "spk_ft_proj"):
        # keep 1024-d pre-embeddings (encode_audio_voxcom.py:68-70)
        import torch

        coder.spk_ft_proj = torch.nn.Identity()

    for fid, path in shard:
        out_fp = save_dir / "emasrc" / f"{fid}.npy"
        if out_fp.exists():
            continue
        try:
            outputs = coder.encode(path, concat=True)
            np.save(out_fp, outputs["features"])
            np.save(
                save_dir / ("spk_preemb" if args.spk_preemb else "spk_emb")
                / f"{fid}.npy",
                outputs["spk_emb"],
            )
        except Exception as e:  # log-and-continue (reference behavior)
            log.error("failed on %s: %s", path, e)


if __name__ == "__main__":
    main()
