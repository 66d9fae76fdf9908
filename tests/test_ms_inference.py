"""End-to-end multi-speaker (v6-style) inference: MsPhnmDataset with aligned
durations + speaker pre-embeddings -> (29, T) artifacts (the
`arttts_inference_ms.py` flow)."""

import numpy as np
import pytest

from arttts_tpu.voxcommunis.data import FeatureTokenizer
from arttts_tpu.voxcommunis.decoder import FeatureDecoder
from arttts_tpu.voxcommunis.io import write_manifest


def test_ms_acoustic_inference(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from arttts_tpu.audio.io import save_wav
    from arttts_tpu.core.config import (
        DataConfig,
        DecoderConfig,
        EncoderConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from arttts_tpu.data.ms_datasets import MsPhnmDataset
    from arttts_tpu.infer.pipeline import run_acoustic_inference
    from arttts_tpu.models.tts import GradTTSModel

    # synthetic voxcommunis layout
    lang = "ab"
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    enc_dir = tmp_path / "encoded_audio_multi" / lang
    (enc_dir / "emasrc").mkdir(parents=True)
    (enc_dir / "spk_preemb").mkdir(parents=True)
    align_lines = []
    for i in range(2):
        fid = f"cv_ab_{lang}_{i:04d}"
        save_wav(wavs / f"{fid}.wav", rng.standard_normal(1600) * 0.1, 16000)
        T = 40
        np.save(enc_dir / "emasrc" / f"{fid}.npy",
                rng.standard_normal((T, 14)).astype(np.float32))
        np.save(enc_dir / "spk_preemb" / f"{fid}.npy",
                rng.standard_normal(1024).astype(np.float32))
        phones = ["SIL"] * 20 + ["a"] * 40 + ["t"] * 20
        align_lines.append(f"{fid}\t{' '.join(phones)}")
    write_manifest(wavs, tmp_path / "man.tsv")
    (tmp_path / "align.align").write_text("\n".join(align_lines) + "\n")

    tok = FeatureTokenizer(FeatureDecoder(sum_diphthong=True))
    ds = MsPhnmDataset(tmp_path, tmp_path / "man.tsv", tmp_path / "align.align", tok)

    cfg = ExperimentConfig(
        "tiny_ms",
        ModelConfig(
            name="grad_ttartic",
            n_feats=16,
            n_spks=2,
            encoder=EncoderConfig(
                kind="ipa_trait", n_input_feats=26, n_channels=16,
                filter_channels=32, filter_channels_dp=16, n_heads=1, n_layers=1,
            ),
            decoder=DecoderConfig(dim=8),
        ),
        DataConfig(dataset="ms_phnm_artic"),
        TrainConfig(),
    )
    model = GradTTSModel(config=cfg.model)
    item = ds[0]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(item["x"])[None],
        jnp.array([item["x"].shape[0]]),
        jnp.zeros((1, 40, 16)),
        jnp.ones((1, 40, 1)),
        jnp.zeros((1,)),
        jnp.asarray(item["spk"])[None],
    )
    paths = run_acoustic_inference(
        cfg, variables, ds, str(tmp_path / "preds"), n_timesteps=2, use_align=True
    )
    assert len(paths) == 2
    arr = np.load(paths[0])
    assert arr.shape[0] == 29
    # aligned durations: output length = sum of repetition counts (40 frames)
    assert arr.shape[1] == int(np.ceil(item["durations"]).sum())
    # sample ids follow the voxcommunis file_id convention
    assert "cv_ab_" in paths[0]
