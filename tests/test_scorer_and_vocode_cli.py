"""Integration: UTMOS directory scorer (bucketing + CSV) and the vocode CLI
with a torch-saved synthetic HiFi-GAN checkpoint."""

import numpy as np
import pytest
import torch

from arttts_tpu.audio.io import load_wav, save_wav


def test_utmos_score_directory(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from arttts_tpu.eval.utmos_scorer import UTMOSScorer, repeat_pad
    from arttts_tpu.models.utmos import UTMOSPredictor
    from tests.test_utmos import SMALL

    # repeat-pad semantics (predict.py:38-51)
    w = np.arange(5, dtype=np.float32)
    out = repeat_pad(w, 12)
    np.testing.assert_array_equal(out[:5], w)
    np.testing.assert_array_equal(out[5:10], w)
    assert len(out) == 12

    model = UTMOSPredictor(ssl_config=SMALL, lstm_hidden=8, projection_hidden=16)
    wav0 = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    variables = model.init(
        jax.random.PRNGKey(0), wav0, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    scorer = UTMOSScorer(model, variables)

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i, dur in enumerate([0.3, 0.5, 1.2]):
        n = int(16000 * dur)
        save_wav(wav_dir / f"c{i}.wav", rng.standard_normal(n) * 0.1, 16000)
    results = scorer.score_directory(
        str(wav_dir), out_csv=str(tmp_path / "mos.csv"), batch_size=2
    )
    assert set(results) == {"c0.wav", "c1.wav", "c2.wav"}
    assert all(np.isfinite(v) for v in results.values())
    lines = (tmp_path / "mos.csv").read_text().strip().splitlines()
    assert len(lines) == 3


def test_vocode_cli_mel(tmp_path, rng):
    """torch-save a reference-shaped hifigan ckpt, run the vocode CLI over
    (161, T) artifacts, expect wavs at 256x upsampling."""
    from tests.test_vocoder import test_hifigan_full_conversion  # reuse builder

    # build the same synthetic state dict inline
    sd = {}
    sd["conv_pre.weight"] = rng.standard_normal((512, 80, 7)).astype(np.float32) * 0.02
    sd["conv_pre.bias"] = np.zeros(512, np.float32)
    ch = 512
    for i, (u, k) in enumerate([(8, 16), (8, 16), (2, 4), (2, 4)]):
        sd[f"ups.{i}.weight"] = rng.standard_normal((ch, ch // 2, k)).astype(np.float32) * 0.02
        sd[f"ups.{i}.bias"] = np.zeros(ch // 2, np.float32)
        ch //= 2
        for j in range(3):
            n = i * 3 + j
            for c in range(3):
                kk = [3, 7, 11][j]
                sd[f"resblocks.{n}.convs1.{c}.weight"] = (
                    rng.standard_normal((ch, ch, kk)).astype(np.float32) * 0.02
                )
                sd[f"resblocks.{n}.convs1.{c}.bias"] = np.zeros(ch, np.float32)
                sd[f"resblocks.{n}.convs2.{c}.weight"] = (
                    rng.standard_normal((ch, ch, kk)).astype(np.float32) * 0.02
                )
                sd[f"resblocks.{n}.convs2.{c}.bias"] = np.zeros(ch, np.float32)
    sd["conv_post.weight"] = rng.standard_normal((1, 32, 7)).astype(np.float32) * 0.02
    sd["conv_post.bias"] = np.zeros(1, np.float32)
    ckpt_path = tmp_path / "hifigan.pt"
    torch.save({"generator": {k: torch.from_numpy(v) for k, v in sd.items()}}, ckpt_path)

    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    T = 12
    for i in range(2):
        arr = np.zeros((161, T), np.float32)
        arr[80:160] = rng.standard_normal((80, T)).astype(np.float32)
        np.save(pred_dir / f"s{i}.npy", arr)

    from arttts_tpu.cli import vocode as vocode_cli

    out_dir = tmp_path / "wavs"
    vocode_cli.main([
        "--mode", "mel", "--torch-ckpt", str(ckpt_path),
        "--pred-dir", str(pred_dir), "--save-dir", str(out_dir),
    ])
    wavs = sorted(out_dir.glob("*.wav"))
    assert len(wavs) == 2
    audio, sr = load_wav(wavs[0])
    assert sr == 22050
    assert len(audio) == T * 256
