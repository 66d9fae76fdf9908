"""YIN pitch tracker + frame loudness tests (native SPARC source features)."""

import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.audio.pitch import PitchConfig, frame_loudness, track_pitch

SR = 16000


def _tone(freq, seconds=1.5, amp=1.0):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("freq", [82.5, 110.0, 220.0, 441.0])
def test_pure_tone_f0(freq):
    f0, voiced = track_pitch(jnp.asarray(_tone(freq)[None]))
    f0 = np.asarray(f0)[0][5:-5]
    voiced = np.asarray(voiced)[0][5:-5]
    assert voiced.mean() > 0.95
    est = np.median(f0[voiced])
    assert abs(est - freq) / freq < 0.01, est


def test_silence_and_noise_unvoiced():
    _, v_sil = track_pitch(jnp.zeros((1, SR), jnp.float32))
    assert float(np.asarray(v_sil).mean()) == 0.0
    rng = np.random.default_rng(0)
    _, v_noise = track_pitch(
        jnp.asarray(rng.standard_normal((1, SR)).astype(np.float32))
    )
    assert float(np.asarray(v_noise).mean()) < 0.2


def test_harmonic_tone_tracks_fundamental():
    """A harmonic complex (f0 + 2f0 + 3f0) must track f0, not a harmonic."""
    f0 = 150.0
    t = np.arange(int(SR * 1.0)) / SR
    wav = sum(
        a * np.sin(2 * np.pi * f0 * k * t) for k, a in ((1, 1.0), (2, 0.6), (3, 0.3))
    ).astype(np.float32)
    est, voiced = track_pitch(jnp.asarray(wav[None]))
    est = np.asarray(est)[0][5:-5]
    voiced = np.asarray(voiced)[0][5:-5]
    assert abs(np.median(est[voiced]) - f0) / f0 < 0.01


def test_batched_matches_single():
    wavs = np.stack([_tone(110.0), _tone(220.0)])
    f0_b, v_b = track_pitch(jnp.asarray(wavs))
    for i in range(2):
        f0_s, v_s = track_pitch(jnp.asarray(wavs[i : i + 1]))
        np.testing.assert_allclose(np.asarray(f0_b)[i], np.asarray(f0_s)[0])
        np.testing.assert_array_equal(np.asarray(v_b)[i], np.asarray(v_s)[0])


def test_frame_grid_is_50hz():
    cfg = PitchConfig()
    n = cfg.num_frames(SR * 2)  # 2 s of audio
    # 50 Hz frame rate: ~100 frames for 2 s (minus window edge)
    assert 95 <= n <= 100


def test_loudness_monotone_in_amplitude():
    quiet = _tone(220.0, amp=0.01)
    loud = _tone(220.0, amp=0.5)
    ld = np.asarray(frame_loudness(jnp.asarray(np.stack([quiet, loud]))))
    assert (ld[1] > ld[0] + 20).all()  # ~34 dB apart
