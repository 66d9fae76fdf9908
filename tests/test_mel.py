"""Golden tests of the JAX mel pipeline vs a torch transcription of the
reference math (meldataset.py:51-95): reflect pad, torch.stft center=False,
sqrt-power magnitude, Slaney mel, log-clamp."""

import jax.numpy as jnp
import numpy as np
import torch

from arttts_tpu.audio.mel import MelConfig, MelSpectrogram, mel_filterbank


def _torch_mel_reference(y, cfg, mel_fb):
    """Reference formula with a supplied mel filterbank (torch, fp32)."""
    y = torch.from_numpy(y).float()
    pad = int((cfg.n_fft - cfg.hop_length) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(cfg.win_length)
    spec = torch.stft(
        y,
        cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=window,
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    mel = torch.matmul(torch.from_numpy(mel_fb), spec)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()  # (B, n_mels, n_frames)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter is nonzero somewhere and triangular (unimodal)
    for i in range(80):
        row = fb[i]
        assert row.max() > 0
        peak = row.argmax()
        assert (np.diff(row[: peak + 1]) >= -1e-9).all()
        assert (np.diff(row[peak:]) <= 1e-9).all()
    # filters only respond below fmax (plus one bin of triangle support)
    freqs = np.linspace(0, 22050 / 2, 513)
    active = fb.sum(axis=0) > 0
    assert freqs[active].max() <= 8000.0 + 22050 / 1024


def test_mel_spectrogram_matches_torch_reference(rng):
    cfg = MelConfig()
    mel = MelSpectrogram(cfg)
    y = (rng.standard_normal((2, 22050)) * 0.3).astype(np.float32)
    got = np.asarray(mel(jnp.asarray(y)))  # (B, n_frames, n_mels)
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    want = _torch_mel_reference(y, cfg, fb)  # (B, n_mels, n_frames)
    want = np.transpose(want, (0, 2, 1))
    assert got.shape == want.shape
    # matmul-DFT vs FFT: allow small fp32 accumulation differences in the
    # log domain; bulk of elements must be tight.
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    frac_tight = np.mean(np.abs(got - want) < 5e-3)
    assert frac_tight > 0.95


def test_mel_num_frames(rng):
    cfg = MelConfig()
    mel = MelSpectrogram(cfg)
    for t in [22050, 4096, 10000]:
        y = rng.standard_normal((1, t)).astype(np.float32) * 0.1
        out = mel(jnp.asarray(y))
        assert out.shape[1] == mel.num_frames(t)
