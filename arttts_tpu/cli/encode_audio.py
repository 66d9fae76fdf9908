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

Two backends:
  * `--native`: the framework's own TPU encoder (`models/sparc_encoder.py`
    — WavLM tap + linear EMA probe + YIN pitch + log-RMS loudness).  Weights
    come from `--wavlm-ckpt` (a torch file holding an HF WavLM state dict)
    and `--probe` (npz with the 12-channel probe); either may be omitted for
    randomly-initialized smoke runs.  This makes the SPARC re-encoding loop
    of `quanti_art` self-contained.
  * default: the external `sparc` coder package if installed; without it
    this CLI reports what it would process.
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
    parser.add_argument("--native", action="store_true",
                        help="use the framework-native TPU encoder instead "
                             "of the external sparc package")
    parser.add_argument("--wavlm-ckpt", default=None,
                        help="torch file with an HF WavLM state dict "
                             "(native backend backbone)")
    parser.add_argument("--probe", default=None,
                        help="npz with the (1024, 12) EMA probe "
                             "(native backend)")
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
    if args.spk_preemb or args.native:
        # the native encoder only produces the 1024-d pre-projection vector,
        # so its outputs always live under spk_preemb/ (artifact semantics
        # match the reference job, which always writes spk_preemb/)
        (save_dir / "spk_preemb").mkdir(exist_ok=True)

    if args.dry_run:
        for fid, path in shard:
            log.info("would encode %s -> %s", path, save_dir / "emasrc" / f"{fid}.npy")
        return

    if args.native:
        _encode_native(args, shard, save_dir, log)
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


def _encode_native(args, shard, save_dir: Path, log) -> None:
    """Native TPU encoding path: bucketed jitted SparcEncoder forwards."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.audio.io import load_wav
    from arttts_tpu.models.sparc_encoder import (
        SparcEncoder,
        SparcEncoderConfig,
        build_encoder_params,
        load_probe_npz,
    )

    cfg = SparcEncoderConfig()
    hf_sd = None
    if args.wavlm_ckpt:
        import torch

        obj = torch.load(args.wavlm_ckpt, map_location="cpu", weights_only=False)
        hf_sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    probe = load_probe_npz(args.probe) if args.probe else None
    if hf_sd is None or probe is None:
        log.warning(
            "native encoder running with %s weights — outputs are for "
            "pipeline smoke only",
            "partially converted" if (hf_sd or probe) else "random",
        )
    enc = SparcEncoder(cfg)
    variables = build_encoder_params(hf_sd, cfg, probe=probe)
    variables = jax.tree.map(jnp.asarray, variables)

    @jax.jit
    def run(wav, mask):
        return enc.apply(variables, wav, frame_mask=mask)

    # static sample-count buckets (multiples of ~2 s) keep jit cache small
    buckets = [32000 * i for i in range(1, 16)]

    for fid, path in shard:
        out_fp = save_dir / "emasrc" / f"{fid}.npy"
        if out_fp.exists():
            continue
        try:
            wav, _sr = load_wav(path, target_sr=cfg.pitch.sample_rate)
            n = len(wav)
            cap = next((b for b in buckets if n <= b), buckets[-1])
            if n > cap:
                log.warning(
                    "%s: %d samples exceed the largest bucket (%d = %.0f s);"
                    " truncating — the reference encodes full length",
                    path, n, cap, cap / cfg.pitch.sample_rate,
                )
            pad = np.zeros((1, cap), np.float32)
            pad[0, :n] = wav[:cap]
            n_valid = enc.num_frames(min(n, cap))
            n_tot = enc.num_frames(cap)
            mask = (np.arange(n_tot) < n_valid).astype(np.float32)[None]
            feats, spk = run(jnp.asarray(pad), jnp.asarray(mask))
            np.save(out_fp, np.asarray(feats)[0, :n_valid])
            # native backend: the speaker vector is the 1024-d PRE-projection
            # embedding, so it is saved as spk_preemb/ regardless of the flag
            # (the external-coder branch's unflagged path saves the coder's
            # projected spk_emb — a different artifact)
            np.save(save_dir / "spk_preemb" / f"{fid}.npy", np.asarray(spk)[0])
        except Exception as e:  # log-and-continue (reference behavior)
            log.error("failed on %s: %s", path, e)


if __name__ == "__main__":
    main()
