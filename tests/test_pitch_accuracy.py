"""Quantified accuracy of the native SPARC source features (VERDICT r02 #6).

The external SPARC coder's pitch channel comes from a CREPE-family neural
tracker (`/root/reference/src/hifigan_inference.py:82`); this framework's
native encoder uses YIN (`audio/pitch.py`). The quanti protocol compares
z-scored channels by PCC (`quanti_art_voxcom.py:118-160`), which washes out
tracker-family offsets — these tests turn that claim into measured numbers
on ground truth the environment can reach: cents error on synthetic tones
(fixed, harmonic, gliding, noisy) and loudness PCC against a known
amplitude envelope. The measured values are recorded in PARITY.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.audio.pitch import PitchConfig, frame_loudness, track_pitch

SR = 16000
CFG = PitchConfig()


def _frame_centers(n_frames):
    return (np.arange(n_frames) * CFG.hop + CFG.frame_length / 2) / SR


def _harmonic(f0_of_t, seconds=1.2, partials=((1, 1.0), (2, 0.5), (3, 0.25)),
              noise=0.0, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    phase = 2 * np.pi * np.cumsum(f0_of_t(t)) / SR
    wav = sum(a * np.sin(k * phase) for k, a in partials)
    if noise:
        wav = wav + noise * np.random.default_rng(seed).standard_normal(len(t))
    return wav.astype(np.float32)


def _cents(est, true):
    return 1200.0 * np.log2(np.maximum(est, 1e-6) / true)


def test_yin_cents_error_grid():
    """Median |error| over a log grid of f0s must be tracker-grade (<10
    cents); p95 < 50 cents. Measured (recorded in PARITY.md): median ~1-3
    cents on clean harmonic tones."""
    freqs = np.geomspace(65.0, 480.0, 25)
    all_err = []
    for f in freqs:
        wav = _harmonic(lambda t, f=f: np.full_like(t, f))
        f0, voiced = track_pitch(jnp.asarray(wav[None]))
        f0 = np.asarray(f0)[0][4:-4]
        v = np.asarray(voiced)[0][4:-4]
        assert v.mean() > 0.9, f
        all_err.append(np.abs(_cents(f0[v], f)))
    err = np.concatenate(all_err)
    med, p95 = np.median(err), np.percentile(err, 95)
    print(f"\nYIN grid ({freqs[0]:.0f}-{freqs[-1]:.0f} Hz): "
          f"median {med:.2f} cents, p95 {p95:.2f} cents")
    assert med < 10.0, med
    assert p95 < 50.0, p95


def test_yin_glide_tracking():
    """Linear 100->250 Hz glide: per-frame cents error stays small."""
    lo, hi, seconds = 100.0, 250.0, 2.0
    wav = _harmonic(lambda t: lo + (hi - lo) * t / seconds, seconds=seconds)
    f0, voiced = track_pitch(jnp.asarray(wav[None]))
    f0 = np.asarray(f0)[0]
    v = np.asarray(voiced)[0]
    true = lo + (hi - lo) * _frame_centers(len(f0)) / seconds
    sl = slice(4, -4)
    err = np.abs(_cents(f0[sl][v[sl]], true[sl][v[sl]]))
    med = np.median(err)
    print(f"\nYIN glide: median {med:.2f} cents, p95 {np.percentile(err,95):.2f}")
    assert v[sl].mean() > 0.9
    assert med < 25.0, med


def test_yin_noise_robustness():
    """~17 dB SNR harmonic tone still tracks within 20 cents median.
    (Harmonic signal power 0.656; noise sigma 0.11 -> SNR 17.3 dB.)"""
    f = 160.0
    wav = _harmonic(lambda t: np.full_like(t, f), noise=0.11)
    f0, voiced = track_pitch(jnp.asarray(wav[None]))
    f0, v = np.asarray(f0)[0][4:-4], np.asarray(voiced)[0][4:-4]
    assert v.mean() > 0.8
    med = np.median(np.abs(_cents(f0[v], f)))
    print(f"\nYIN @17dB SNR: median {med:.2f} cents")
    assert med < 20.0, med


def test_loudness_pcc_vs_envelope():
    """Frame loudness must correlate near-perfectly with the true dB
    envelope (the quanti protocol's loudness channel is PCC-scored)."""
    seconds = 2.0
    t = np.arange(int(SR * seconds)) / SR
    env = 0.05 + 0.95 * 0.5 * (1 + np.sin(2 * np.pi * 0.7 * t))
    wav = (env * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    loud = np.asarray(frame_loudness(jnp.asarray(wav[None])))[0]
    centers = (_frame_centers(len(loud)) * SR).astype(int)
    true_db = 20 * np.log10(env[np.clip(centers, 0, len(env) - 1)] + 1e-5)
    pcc = np.corrcoef(loud, true_db)[0, 1]
    print(f"\nloudness PCC vs true envelope: {pcc:.4f}")
    assert pcc > 0.99, pcc


def test_median_smoothing_preserves_onsets():
    """Voiced frames at voicing onsets keep nonzero f0 (ADVICE r02: the
    median window must not be dragged to 0 by unvoiced neighbors)."""
    f = 180.0
    tone = _harmonic(lambda t: np.full_like(t, f), seconds=0.6)
    sil = np.zeros(int(SR * 0.4), np.float32)
    wav = np.concatenate([sil, tone, sil])
    f0, voiced = track_pitch(jnp.asarray(wav[None]))
    f0, v = np.asarray(f0)[0], np.asarray(voiced)[0]
    # no voiced frame may be dragged to the unvoiced 0-filler by the median
    # window (boundary frames may still carry genuine estimation error from
    # half-silent analysis windows — that is the tracker, not the filter)
    assert (f0[v] > 25.0).all(), f0[v].min()
    # frames whose whole analysis window lies inside the tone track f0
    centers = _frame_centers(len(f0)) * SR
    inside = (centers - CFG.frame_length / 2 > len(sil) + CFG.hop) & (
        centers + CFG.frame_length / 2 < len(sil) + len(tone) - CFG.hop
    )
    good = inside & v
    assert good.sum() > 10
    err = np.abs(_cents(f0[good], f))
    assert np.median(err) < 10.0, np.median(err)
