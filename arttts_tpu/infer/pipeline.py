"""Inference pipeline stages with the reference's filesystem contract.

Stage 1 (acoustic, ref `arttts_inference.py:317-379`): per sample, save
`{sample_id}.npy` of shape (29, T) for articulatory versions — 14 reordered
encoder rows, 14 reordered decoder rows, 1 input_map row (frame -> input
token index from the binary alignment) — or (161, T) for mel versions.

Stage 2 (vocoding): mel -> wav through the converted HiFi-GAN
(`vocoder_inference.py:76-141`), or articulatory -> wav through the SPARC
FiLM generator with pitch/loudness denormalization
(`hifigan_inference.py:128-217`, `hifigan_inference_ms.py:81-141`).

Downstream consumers (`quanti_art_voxcom.py:104-118`) glob these artifacts;
keeping the shapes/layout identical makes the two frameworks' stages
interchangeable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.core.config import SPARC_REORDER_FEATS, ExperimentConfig
from arttts_tpu.infer.sampler import frame_bucket, synthesize
from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.ops.shape import fix_len_compatibility


def _sample_id(dataset, index: int) -> str:
    if hasattr(dataset, "entries"):
        return Path(dataset.entries[index][0]).stem
    return dataset.manifest[index][0]  # voxcommunis manifests


def run_acoustic_inference_batched(
    config: ExperimentConfig,
    variables,
    dataset,
    save_dir: str,
    batch_size: int = 8,
    n_timesteps: int = 50,
    temperature: float = 1.0,
    seed: int = 37,
    max_frames_cap: int = 2048,
) -> list:
    """Batched synthesis (serving mode): items are length-grouped, padded to
    shared static buckets, and synthesized `batch_size` sentences per device
    call. `decoder.masked_norm=True` is auto-enabled (VERDICT r4 #6): padded
    batches need padding-exact GroupNorm statistics to match per-sentence
    synthesis (the reference cannot batch at all —
    `arttts_inference.py:227-231`); masked_norm is computation-only, so the
    same trained `variables` apply. Writes the same (29|161, T) artifacts.
    """
    import dataclasses

    model_cfg = config.model
    if not model_cfg.decoder.masked_norm:
        model_cfg = dataclasses.replace(
            model_cfg,
            decoder=dataclasses.replace(model_cfg.decoder, masked_norm=True),
        )
    model = GradTTSModel(config=model_cfg)
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    is_artic = config.model.n_feats == 16
    rng = jax.random.PRNGKey(seed)

    # gather inputs + order by text length for tight buckets
    items = [dataset[i] for i in range(len(dataset))]
    order = sorted(range(len(items)), key=lambda i: items[i]["x"].shape[0])
    saved = []
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        xs = [np.asarray(items[i]["x"]) for i in idx]
        B = len(xs)
        T_x = frame_bucket(max(x.shape[0] for x in xs), buckets=(32, 64, 128, 256, 512))
        if xs[0].ndim == 1:
            x = np.zeros((B, T_x), xs[0].dtype)
        else:
            x = np.zeros((B, T_x, xs[0].shape[1]), np.float32)
        for j, xi in enumerate(xs):
            x[j, : xi.shape[0]] = xi
        x_lengths = jnp.asarray([xi.shape[0] for xi in xs], jnp.int32)
        spk = None
        if "spk" in items[idx[0]]:
            spk = jnp.asarray(np.stack([np.asarray(items[i]["spk"]) for i in idx]))
        durations = None
        if "durations" in items[idx[0]]:  # aligned-input models (v6)
            dur = np.zeros((B, T_x), np.float32)
            for j, i in enumerate(idx):
                d = np.ceil(np.asarray(items[i]["durations"]))
                dur[j, : len(d)] = d
            durations = jnp.asarray(dur)
            pred = int(dur.sum(axis=1).max())
        else:
            # predicted frames drive one shared bucket per batch
            w = predict_frames(model, variables, jnp.asarray(x), x_lengths, spk)
            pred = int(np.ceil(np.asarray(w).max()))
        max_frames = frame_bucket(min(fix_len_compatibility(max(pred, 64)), max_frames_cap))
        rng, key = jax.random.split(rng)
        enc, dec, attn, y_len = synthesize(
            model,
            variables,
            key,
            jnp.asarray(x),
            x_lengths,
            n_timesteps=n_timesteps,
            max_frames=int(max_frames),
            temperature=temperature,
            spk=spk,
            x_durations=durations,
        )
        for j, i in enumerate(idx):
            L = int(np.asarray(y_len)[j])
            enc_np = np.asarray(enc)[j, :L]
            dec_np = np.asarray(dec)[j, :L]
            attn_np = np.asarray(attn)[j, :, :L]
            input_map = attn_np.argmax(axis=0)
            if is_artic:
                enc_np = enc_np[:, list(SPARC_REORDER_FEATS)]
                dec_np = dec_np[:, list(SPARC_REORDER_FEATS)]
            out = np.vstack([enc_np.T, dec_np.T, input_map[None, :]])
            path = save_dir / f"{_sample_id(dataset, i)}.npy"
            np.save(path, out.astype(np.float32))
            saved.append(str(path))
    return saved


def predict_frames(model, variables, x, x_lengths, spk=None):
    """Total predicted frames per sentence (sum of ceil durations)."""
    from arttts_tpu.infer.sampler import predict_lengths

    w = predict_lengths(model, variables, x, x_lengths, spk)
    return jnp.sum(jnp.ceil(w[:, :, 0]), axis=1)


def run_acoustic_inference(
    config: ExperimentConfig,
    variables,
    dataset,
    save_dir: str,
    n_timesteps: int = 50,
    temperature: float = 1.0,
    length_scale: float = 1.0,
    use_align: bool = False,
    seed: int = 37,
    max_frames_cap: int = 2048,
    solver: str = "euler",
) -> list:
    """Run per-sample synthesis over `dataset`, saving the (29|161, T) npy
    contract. Returns the list of saved paths."""
    model = GradTTSModel(config=config.model)
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    is_artic = config.model.n_feats == 16
    rng = jax.random.PRNGKey(seed)
    saved = []
    for index in range(len(dataset)):
        item = dataset[index]
        x = np.asarray(item["x"])[None]
        x_lengths = jnp.array([x.shape[1]], jnp.int32)
        durations = None
        if use_align and "durations" in item:
            durations = jnp.asarray(np.ceil(item["durations"])[None])
        spk = jnp.asarray(np.asarray(item["spk"])[None]) if "spk" in item else None
        rng, key = jax.random.split(rng)
        # static bucket from predicted/aligned length keeps jit caches small
        if durations is not None:
            pred_frames = int(np.ceil(np.asarray(durations).sum()))
            max_frames = frame_bucket(
                min(fix_len_compatibility(pred_frames), max_frames_cap)
            )
            enc, dec, attn, y_len = synthesize(
                model,
                variables,
                key,
                jnp.asarray(x),
                x_lengths,
                n_timesteps=n_timesteps,
                max_frames=int(max_frames),
                temperature=temperature,
                length_scale=length_scale,
                spk=spk,
                x_durations=durations,
                solver=solver,
            )
        else:
            # two-dispatch serving path: ONE encoder pass sizes the bucket
            # AND feeds the decoder (sampler.py:encode_text) — a fixed
            # 16*T_x bound can overshoot into a 2x-too-large bucket and
            # silently double decoder cost
            from arttts_tpu.infer.sampler import (
                encode_text, synthesize_from_encoding,
            )

            mu_x, logw, x_mask, pf = encode_text(
                model, variables, jnp.asarray(x), x_lengths, spk
            )
            pred_frames = min(
                max_frames_cap,
                max(64, int(np.ceil(float(np.asarray(pf)[0]) * length_scale - 1e-6))),
            )
            max_frames = frame_bucket(
                min(fix_len_compatibility(pred_frames), max_frames_cap)
            )
            enc, dec, attn, y_len = synthesize_from_encoding(
                model,
                variables,
                key,
                mu_x,
                logw,
                x_mask,
                n_timesteps=n_timesteps,
                max_frames=int(max_frames),
                temperature=temperature,
                length_scale=length_scale,
                spk=spk,
                solver=solver,
            )
        L = int(np.asarray(y_len)[0])
        enc_np = np.asarray(enc)[0, :L]  # (L, n_feats)
        dec_np = np.asarray(dec)[0, :L]
        attn_np = np.asarray(attn)[0, :, :L]  # (T_x, L)
        input_map = attn_np.argmax(axis=0)  # frame -> input token index
        if is_artic:
            enc_np = enc_np[:, list(SPARC_REORDER_FEATS)]  # (L, 14)
            dec_np = dec_np[:, list(SPARC_REORDER_FEATS)]
        out = np.vstack([enc_np.T, dec_np.T, input_map[None, :]])  # (29|161, L)
        path = save_dir / f"{_sample_id(dataset, index)}.npy"
        np.save(path, out.astype(np.float32))
        saved.append(str(path))
    return saved


def split_acoustic_artifact(arr: np.ndarray, n_feats: int = 14):
    """(2*n_feats+1, T) artifact -> (enc (T, n), dec (T, n), input_map (T,))."""
    enc = arr[:n_feats].T
    dec = arr[n_feats : 2 * n_feats].T
    input_map = arr[2 * n_feats]
    return enc, dec, input_map


def run_mel_vocoder(
    generator, gen_variables, artifact_paths, save_dir: str, sample_rate: int = 22050
) -> list:
    """Saved (161, T) mel artifacts -> wav via HiFi-GAN
    (vocoder_inference.py:137-141)."""
    from arttts_tpu.audio.io import save_wav

    from arttts_tpu.infer.chunked import vocode_chunked

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    apply = jax.jit(lambda v, m: generator.apply(v, m))
    saved = []
    for p in artifact_paths:
        arr = np.load(p)
        _, dec, _ = split_acoustic_artifact(arr, n_feats=80)
        # fixed-shape windows: one compile serves every artifact length
        wav = vocode_chunked(apply, gen_variables, dec.astype(np.float32))
        out = save_dir / (Path(p).stem + ".wav")
        save_wav(out, wav, sample_rate)
        saved.append(str(out))
    return saved


def denormalize_sparc_features(
    dec: np.ndarray,
    pitch_stats: tuple,
    loudness_stats: Optional[tuple] = None,
) -> np.ndarray:
    """Undo the dataset normalization before vocoding
    (hifigan_inference.py:185-205): pitch ch 12 back to Hz via mu + z*std;
    loudness ch 13 via exp(mu + z*std) when it was log-normalized."""
    out = dec.copy()
    mu_p, std_p = pitch_stats
    out[:, 12] = out[:, 12] * std_p + mu_p
    if loudness_stats is not None:
        mu_l, std_l = loudness_stats
        out[:, 13] = np.exp(out[:, 13] * std_l + mu_l)
    return out


def run_sparc_vocoder(
    generator,
    gen_variables,
    artifact_paths,
    spk_ft: np.ndarray,
    save_dir: str,
    pitch_stats: tuple,
    loudness_stats: Optional[tuple] = None,
    sample_rate: int = 16000,
) -> list:
    """Saved (29, T) articulatory artifacts -> wav via the FiLM generator
    (hifigan_inference_ms.py:91-141)."""
    from arttts_tpu.audio.io import save_wav

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    from arttts_tpu.models.hifigan import (
        SpkSparcHiFiGANGenerator,
        spk_sparc_forward_fast,
    )

    from arttts_tpu.ops.mrf_pallas import mrf_runtime_enabled

    if isinstance(generator, SpkSparcHiFiGANGenerator) and mrf_runtime_enabled():
        # Pallas FiLM-MRF kernel path (ops/mrf_pallas.py) on TPU
        apply = jax.jit(
            lambda v, c, s: spk_sparc_forward_fast(generator, v, c, s)
        )
    else:
        apply = jax.jit(lambda v, c, s: generator.apply(v, c, s))
    from arttts_tpu.infer.chunked import vocode_chunked

    saved = []
    for p in artifact_paths:
        arr = np.load(p)
        _, dec, _ = split_acoustic_artifact(arr, n_feats=14)
        dec = denormalize_sparc_features(dec, pitch_stats, loudness_stats)
        # fixed-shape windows: one compile serves every artifact length
        wav = vocode_chunked(
            apply, gen_variables, dec.astype(np.float32), spk=spk_ft
        )
        out = save_dir / (Path(p).stem + ".wav")
        save_wav(out, wav, sample_rate)
        saved.append(str(out))
    return saved
