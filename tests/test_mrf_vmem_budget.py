"""The MRF kernel's VMEM budget model (the BENCH_r02 postmortem): one
coordinated invariant, asserted at trace time, env-overridable for sweeps."""

import numpy as np
import pytest

from arttts_tpu.ops.mrf_pallas import (
    LANES,
    N_LIVE_BUFFERS,
    VMEM_LIMIT_BYTES,
    VMEM_SLACK_BYTES,
    _pick_tile,
    _weight_bytes,
    mrf_runtime_enabled,
    mrf_supported,
)

KS, DIL = (3, 7, 11), (1, 3, 5)


@pytest.mark.parametrize("C,H", [(32, 32), (64, 40), (128, 72)])
def test_pick_tile_respects_budget(C, H):
    """Every auto-picked tile satisfies the asserted invariant with margin,
    divides the row count, and is a power of two."""
    rows = 49152  # the 768-mel-frame serving shape for every late stage
    tile = _pick_tile(rows, H, KS, DIL, C)
    assert rows % tile == 0 and tile & (tile - 1) == 0
    est = _weight_bytes(KS, DIL, C) + N_LIVE_BUFFERS * 4 * max(C, LANES) * (
        tile + 2 * H
    )
    assert est <= VMEM_LIMIT_BYTES - VMEM_SLACK_BYTES
    # the r02 crash configuration (T_b=8192 at C=64) must be rejected now
    bad = _weight_bytes(KS, DIL, 64) + N_LIVE_BUFFERS * 4 * 128 * (8192 + 80)
    assert bad > VMEM_LIMIT_BYTES - VMEM_SLACK_BYTES


def test_pick_tile_env_override(monkeypatch):
    monkeypatch.setenv("ARTTTS_MRF_TILE", "256")
    assert _pick_tile(49152, 40, KS, DIL, 64) == 256
    # an override that violates the budget fails loudly, not as a compile OOM
    monkeypatch.setenv("ARTTTS_MRF_TILE", "16384")
    with pytest.raises(AssertionError, match="exceeds budget"):
        _pick_tile(49152, 40, KS, DIL, 64)
    # an override that does not divide the rows is ignored
    monkeypatch.setenv("ARTTTS_MRF_TILE", "1000")
    t = _pick_tile(49152, 40, KS, DIL, 64)
    assert 49152 % t == 0


def test_bf16_halves_weight_budget():
    assert _weight_bytes(KS, DIL, 64, itemsize=2) * 2 == _weight_bytes(
        KS, DIL, 64, itemsize=4
    )
    t32 = _pick_tile(3 * 2**14, 40, KS, DIL, 64, itemsize=4)
    t16 = _pick_tile(3 * 2**14, 40, KS, DIL, 64, itemsize=2)
    assert t16 >= t32  # smaller resident weights can only raise the ceiling


def test_supported_channels():
    for C in (32, 64, 128):
        assert mrf_supported(C, KS, DIL)
    assert not mrf_supported(48, KS, DIL)  # 128 % 48 != 0
    assert not mrf_supported(256, KS, DIL)  # wide channels gated off


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("ARTTTS_DISABLE_MRF_PALLAS", "1")
    assert not mrf_runtime_enabled()
    monkeypatch.setenv("ARTTTS_DISABLE_MRF_PALLAS", "0")
    # on the CPU test backend the gate is off regardless; the env path is
    # what the bench fallback relies on
    import jax

    assert mrf_runtime_enabled() == (jax.default_backend() != "cpu")


def test_liveness_model_matches_r02_crash_point():
    """The calibration datum: at T_b=8192/H=40/rw=128 the compiler reported
    117.54M used (weights 8.26 MB per the crash dump's operand shapes). The
    model must predict AT LEAST that for the same configuration."""
    w = _weight_bytes(KS, DIL, 64)
    np.testing.assert_allclose(w, 2 * 3 * (3 + 7 + 11) * 128 * 128 * 4)
    est = w + N_LIVE_BUFFERS * 4 * 128 * (8192 + 80)
    assert est >= 117.54e6
    # implied measured liveness ~25.8 buffers; the constant must exceed it
    measured = (117.54e6 - w) / (4 * 128 * (8192 + 80))
    assert N_LIVE_BUFFERS > measured, (N_LIVE_BUFFERS, measured)
