"""Metric correctness + inference pipeline filesystem contract."""

import numpy as np
import pytest

from arttts_tpu.eval.metrics import (
    dtw_path,
    ema_mean_pcc,
    mel_l2,
    normalized_dtw_score,
    pearson_correlation,
)


def test_dtw_identity():
    s = np.random.default_rng(0).standard_normal((20, 3))
    path, dist = dtw_path(s, s)
    assert dist < 1e-6
    assert path == [(i, i) for i in range(20)]


def test_dtw_shifted():
    a = np.sin(np.linspace(0, 6, 50))[:, None]
    b = np.sin(np.linspace(0, 6, 70))[:, None]
    score, ap, bp = normalized_dtw_score(a, b)
    assert ap.shape == bp.shape
    assert score < 0.05  # same curve, warped


def test_dtw_monotonic_path():
    rng = np.random.default_rng(1)
    a, b = rng.standard_normal((9, 2)), rng.standard_normal((13, 2))
    path, _ = dtw_path(a, b)
    ii = np.array([p[0] for p in path])
    jj = np.array([p[1] for p in path])
    assert path[0] == (0, 0) and path[-1] == (8, 12)
    assert (np.diff(ii) >= 0).all() and (np.diff(jj) >= 0).all()
    assert ((np.diff(ii) + np.diff(jj)) >= 1).all()


def test_pcc():
    a = np.arange(100.0)
    assert abs(pearson_correlation(a, 2 * a + 5) - 1.0) < 1e-9
    assert abs(pearson_correlation(a, -a) + 1.0) < 1e-9
    rng = np.random.default_rng(2)
    pred = rng.standard_normal((50, 12))
    assert abs(ema_mean_pcc(pred, pred) - 1.0) < 1e-9


def test_mel_l2():
    a = np.zeros((10, 80))
    b = np.ones((12, 80))
    assert abs(mel_l2(a, b) - np.sqrt(80)) < 1e-9


def test_acoustic_inference_contract(tmp_path, rng):
    """Tiny artic model over a fake dataset -> (29, T) artifacts."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.core.config import (
        DataConfig,
        DecoderConfig,
        EncoderConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from arttts_tpu.infer.pipeline import run_acoustic_inference, split_acoustic_artifact
    from arttts_tpu.models.tts import GradTTSModel

    cfg = ExperimentConfig(
        "tiny_art",
        ModelConfig(
            name="art_tts",
            n_feats=16,
            encoder=EncoderConfig(
                kind="ipa_trait",
                n_input_feats=25,
                n_channels=16,
                filter_channels=32,
                filter_channels_dp=16,
                n_heads=1,
                n_layers=1,
            ),
            decoder=DecoderConfig(dim=8),
        ),
        DataConfig(),
        TrainConfig(),
    )

    class FakeDS:
        entries = [["wavs/utt000.wav"], ["wavs/utt001.wav"]]

        def __len__(self):
            return 2

        def __getitem__(self, i):
            T = 7 + i
            return {"x": rng.integers(-1, 2, size=(T, 25)).astype(np.float32)}

    model = GradTTSModel(config=cfg.model)
    ds = FakeDS()
    x = np.asarray(ds[0]["x"])[None]
    key = jax.random.PRNGKey(0)
    y = rng.standard_normal((1, 32, 16)).astype(np.float32)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(x),
        jnp.array([x.shape[1]]),
        jnp.asarray(y),
        jnp.ones((1, 32, 1)),
        jnp.zeros((1,)),
    )
    paths = run_acoustic_inference(
        cfg, variables, ds, str(tmp_path / "preds"), n_timesteps=2
    )
    assert len(paths) == 2
    arr = np.load(paths[0])
    assert arr.shape[0] == 29  # 14 enc + 14 dec + input_map
    enc, dec, imap = split_acoustic_artifact(arr, 14)
    assert enc.shape[1] == 14 and dec.shape[1] == 14
    # input_map is a valid monotonic token index sequence
    assert (np.diff(imap) >= 0).all()
    assert imap.max() < x.shape[1]


def test_quanti_art(tmp_path, rng):
    """quanti_art: (29, T) artifacts vs SPARC-style reference npys."""
    from arttts_tpu.eval.quanti import quanti_art

    pred_dir = tmp_path / "preds"
    ref_dir = tmp_path / "refs"
    pred_dir.mkdir()
    ref_dir.mkdir()
    T = 50
    for i in range(3):
        ref = rng.standard_normal((T, 14)).astype(np.float32)
        np.save(ref_dir / f"u{i}.npy", ref)
        arr = np.zeros((29, T), np.float32)
        arr[14:28] = ref.T + 0.01 * rng.standard_normal((14, T))
        np.save(pred_dir / f"u{i}.npy", arr)
    results = quanti_art(str(pred_dir), str(ref_dir), str(tmp_path / "qa.csv"))
    assert len(results) == 3
    for v in results.values():
        assert v["ema_pcc"] > 0.99
        assert v["pitch_pcc"] > 0.99
        assert v["loudness_pcc"] > 0.99
        assert np.isfinite(v["dtw"])
    header = (tmp_path / "qa.csv").read_text().splitlines()[0]
    assert header == "sample_id,ema_pcc,pitch_pcc,loudness_pcc,dtw"


def test_run_sparc_vocoder(tmp_path, rng):
    """(29, T) artifacts -> wavs through a random-init SPARC FiLM generator
    with pitch/loudness denormalization."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.audio.io import load_wav
    from arttts_tpu.infer.pipeline import run_sparc_vocoder
    from arttts_tpu.models.hifigan import (
        SparcHiFiGANGenerator,
        SpkSparcHiFiGANGenerator,
    )

    gen = SpkSparcHiFiGANGenerator(generator=SparcHiFiGANGenerator(channels=32))
    c0 = jnp.zeros((1, 4, 14))
    spk0 = jnp.zeros((1, 1024))
    variables = gen.init(jax.random.PRNGKey(0), c0, spk0)

    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    T = 8
    arr = np.zeros((29, T), np.float32)
    arr[14:28] = rng.standard_normal((14, T)).astype(np.float32)
    np.save(pred_dir / "s0.npy", arr)

    out = run_sparc_vocoder(
        gen,
        variables,
        [str(pred_dir / "s0.npy")],
        spk_ft=rng.standard_normal(1024).astype(np.float32),
        save_dir=str(tmp_path / "wavs"),
        pitch_stats=(120.0, 30.0),
        loudness_stats=(0.0, 1.0),
        sample_rate=16000,
    )
    assert len(out) == 1
    audio, sr = load_wav(out[0])
    assert sr == 16000 and len(audio) == T * 256
