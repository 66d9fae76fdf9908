"""Training CLI — replaces the reference's per-version `train_v*.py` scripts
and the SLURM wrappers (`src/scripts/train*.sh`):

    python -m arttts_tpu.cli.train --preset v2 --data-root /data \
        --train-filelist lists/train.txt --valid-filelist lists/valid.txt

Distributed: pass --mesh to shard the batch over all local devices (the
reference's `train_v1_1_dist.py --world_size N` equivalent; multi-host comes
from `jax.distributed.initialize` + per-host filelist sharding).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging


def build_dataset(cfg, args, filelist):
    from arttts_tpu.data import datasets as D

    kind = cfg.data.dataset
    if kind == "text_mel":
        return D.TextMelDataset(
            filelist,
            args.cmudict or "arttts_tpu/resources/cmu_dictionary",
            data_root_dir=args.data_root,
            mel_cache_dir=args.mel_cache,
            gradtts_text_conv=cfg.data.gradtts_text_conv,
        )
    if kind == "text_artic":
        return D.TextArticDataset(
            filelist,
            args.cmudict or "arttts_tpu/resources/cmu_dictionary",
            artic_dir=args.artic_dir or args.data_root,
        )
    if kind == "phnm_artic":
        return D.PhnmArticDataset(filelist, data_root_dir=args.data_root)
    if kind == "phnm_mel":
        return D.PhnmMelDataset(
            filelist, data_root_dir=args.data_root, mel_cache_dir=args.mel_cache
        )
    if kind == "text_art":
        return D.TextArtDataset(
            filelist,
            args.cmudict or "arttts_tpu/resources/cmu_dictionary",
            artic_dir=args.artic_dir or args.data_root,
            gradtts_text_conv=cfg.data.gradtts_text_conv,
        )
    if kind == "ms_phnm_artic":
        from arttts_tpu.data.ms_datasets import MsPhnmArticDataset
        from arttts_tpu.voxcommunis.data import FeatureTokenizer
        from arttts_tpu.voxcommunis.decoder import FeatureDecoder

        tok = FeatureTokenizer(FeatureDecoder(sum_diphthong=True))
        separate = args.separate_files or cfg.data.separate_files
        # monolingual v6/v6_zhCN: the preset's lang picks the per-language
        # manifest/alignment file inside the given directories
        manifest, alignment = args.manifest, args.alignment
        if not separate and cfg.data.lang:
            from pathlib import Path

            if manifest and Path(manifest).is_dir():
                manifest = str(Path(manifest) / f"{cfg.data.lang}.tsv")
            if alignment and Path(alignment).is_dir():
                alignment = str(Path(alignment) / f"{cfg.data.lang}.align")
        return MsPhnmArticDataset(
            args.data_root,
            manifest,
            alignment,
            tok,
            separate_files=separate,
            exclude_langs=list(cfg.data.exclude_langs) or None,
        )
    raise ValueError(f"unknown dataset kind {kind}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="v2")
    parser.add_argument("--data-root", default=".")
    parser.add_argument("--train-filelist")
    parser.add_argument("--valid-filelist")
    parser.add_argument("--cmudict")
    parser.add_argument("--artic-dir")
    parser.add_argument("--manifest")
    parser.add_argument("--alignment")
    parser.add_argument("--separate-files", action="store_true")
    parser.add_argument("--mel-cache")
    parser.add_argument("--log-dir")
    parser.add_argument("--epochs", type=int)
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--mesh", action="store_true", help="data-parallel over all devices")
    parser.add_argument("--language-upsample", type=float,
                        help="temperature-based language upsampling factor "
                             "(e.g. 0.5, multilingual v6/msml1h)")
    parser.add_argument("--resume", nargs="?", const="latest")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from arttts_tpu.core.runtime import setup_runtime
    setup_runtime()

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.train.trainer import Trainer

    cfg = get_preset(args.preset)
    if args.batch_size or args.log_dir:
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train,
                **{
                    k: v
                    for k, v in {
                        "batch_size": args.batch_size,
                        "log_dir": args.log_dir,
                    }.items()
                    if v
                },
            ),
        )
    train_ds = build_dataset(cfg, args, args.train_filelist or cfg.data.train_filelist)
    valid_ds = (
        build_dataset(cfg, args, args.valid_filelist)
        if args.valid_filelist
        else None
    )
    language_upsample = (
        args.language_upsample
        if args.language_upsample is not None
        else (cfg.data.language_upsample or None)
    )
    trainer = Trainer(cfg, train_ds, valid_dataset=valid_ds, use_mesh=args.mesh,
                      log_dir=args.log_dir,
                      language_upsample=language_upsample)
    if args.resume:
        trainer.resume(None if args.resume == "latest" else args.resume)
    trainer.fit(n_epochs=args.epochs)


if __name__ == "__main__":
    main()
