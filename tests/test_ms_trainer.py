"""v6 (GradTTArtic) end-to-end training through the Trainer: aligned
durations + speaker pre-embeddings, loss selected by model family."""

import numpy as np
import pytest

from arttts_tpu.core.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from arttts_tpu.train.trainer import Trainer
from arttts_tpu.voxcommunis.data import FeatureTokenizer
from arttts_tpu.voxcommunis.decoder import FeatureDecoder
from arttts_tpu.voxcommunis.io import write_manifest


@pytest.mark.slow
def test_ms_trainer(tmp_path, rng):
    from arttts_tpu.audio.io import save_wav
    from arttts_tpu.data.ms_datasets import MsPhnmArticDataset

    lang = "ab"
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    enc_dir = tmp_path / "encoded_audio_multi" / lang
    (enc_dir / "emasrc").mkdir(parents=True)
    (enc_dir / "spk_preemb").mkdir(parents=True)
    align_lines = []
    for i in range(4):
        fid = f"cv_ab_{lang}_{i:04d}"
        save_wav(wavs / f"{fid}.wav", rng.standard_normal(1600) * 0.1, 16000)
        T = 40 + i  # odd lengths exercise the init padding too
        np.save(enc_dir / "emasrc" / f"{fid}.npy",
                rng.standard_normal((T, 14)).astype(np.float32))
        np.save(enc_dir / "spk_preemb" / f"{fid}.npy",
                rng.standard_normal(1024).astype(np.float32))
        phones = ["SIL"] * 20 + ["a"] * (2 * T - 40) + ["t"] * 20
        align_lines.append(f"{fid}\t{' '.join(phones)}")
    write_manifest(wavs, tmp_path / "man.tsv")
    (tmp_path / "align.align").write_text("\n".join(align_lines) + "\n")

    tok = FeatureTokenizer(FeatureDecoder(sum_diphthong=True))
    ds = MsPhnmArticDataset(
        tmp_path, tmp_path / "man.tsv", tmp_path / "align.align", tok
    )

    cfg = ExperimentConfig(
        "tiny_v6",
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
        TrainConfig(log_dir=str(tmp_path / "logs"), batch_size=2, out_size=16,
                    save_every=10, val_every=10),
    )
    trainer = Trainer(cfg, ds, valid_dataset=ds, tb_writer=False)
    trainer.tb = None
    metrics = trainer.fit(n_epochs=1)
    assert np.isfinite(metrics["total_loss"])
    assert set(metrics) >= {"prior_loss", "diff_loss"}  # no dur loss for v6
    assert "dur_loss" not in metrics
