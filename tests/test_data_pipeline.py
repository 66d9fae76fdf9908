"""End-to-end data pipeline tests on a tiny synthetic corpus replicating the
reference's filelist/emasrc layouts (SURVEY.md §4 item 4)."""

import os
from pathlib import Path

import numpy as np
import pytest

from arttts_tpu.audio.io import load_wav, save_wav
from arttts_tpu.data.batching import BucketBatcher, DataLoader, pad_batch
from arttts_tpu.data.datasets import PhnmArticDataset, TextArticDataset, TextMelDataset
from arttts_tpu.data.features import load_art_features

CMU_PATH = str(
    Path(__file__).parent.parent / "arttts_tpu" / "resources" / "cmu_dictionary"
)

TEXTS = [
    "hello world.",
    "the quick brown fox jumps over the lazy dog.",
    "printing was done in a different way.",
    "this is a test sentence.",
    "speech synthesis on tensor processing units.",
    "six sentences are enough for a tiny corpus.",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    wavs = root / "wavs"
    emasrc = root / "encoded" / "emasrc"
    wavs.mkdir(parents=True)
    emasrc.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(TEXTS):
        dur = rng.uniform(0.4, 0.9)
        t = np.arange(int(22050 * dur)) / 22050.0
        audio = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t).astype(np.float32)
        fp = wavs / f"utt{i:03d}.wav"
        save_wav(fp, audio, 22050)
        # synthetic 14-ch SPARC features at 50 Hz
        T = int(dur * 50)
        np.save(emasrc / f"utt{i:03d}.npy", rng.standard_normal((T, 14)).astype(np.float32))
        lines.append(f"{fp}|{text}")
    filelist = root / "filelist.txt"
    filelist.write_text("\n".join(lines))
    return root, str(filelist)


def test_wav_io_roundtrip(tmp_path, rng):
    audio = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    save_wav(tmp_path / "a.wav", audio, 16000)
    loaded, sr = load_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(loaded, audio, atol=1e-3)
    res, sr2 = load_wav(tmp_path / "a.wav", target_sr=8000)
    assert sr2 == 8000 and len(res) == 500


def test_text_mel_dataset(corpus):
    root, filelist = corpus
    ds = TextMelDataset(
        filelist, CMU_PATH, data_root_dir=str(root), mel_cache_dir=str(root / "melcache")
    )
    item = ds[0]
    assert item["x"].ndim == 1 and item["x"].dtype == np.int32
    assert item["y"].ndim == 2 and item["y"].shape[1] == 80
    # cache hit path
    item2 = ds[0]
    np.testing.assert_array_equal(item["y"], item2["y"])


def test_text_artic_dataset(corpus):
    root, filelist = corpus
    ds = TextArticDataset(filelist, CMU_PATH, artic_dir=str(root / "encoded"))
    item = ds[0]
    assert item["x"].ndim == 2 and item["x"].shape[1] == 25
    assert item["y"].ndim == 2 and item["y"].shape[1] == 16
    # pitch channel normalized
    from arttts_tpu.core.config import SPARC_PITCH_IDX

    pitch = item["y"][:, SPARC_PITCH_IDX]
    assert abs(pitch.mean()) < 1e-5
    assert abs(pitch.std() - 1.0) < 1e-4


def test_phnm_artic_dataset(corpus, tmp_path):
    root, _ = corpus
    # build phnm3 files + filelist rows [wav, phnm3]
    phnm_dir = root / "phnm3"
    phnm_dir.mkdir(exist_ok=True)
    lines = []
    for i in range(3):
        phones = np.array(
            [(0.0, 0.1, "h"), (0.1, 0.25, "ə"), (0.25, 0.4, "l"), (0.4, 0.6, "oʊ")],
            dtype=[("start", "f4"), ("end", "f4"), ("phone", "U8")],
        )
        fp = phnm_dir / f"utt{i:03d}_phnm3.npy"
        np.save(fp, phones, allow_pickle=True)
        lines.append(f"wavs/utt{i:03d}.wav|{fp}")
    filelist = tmp_path / "phnm_filelist.txt"
    filelist.write_text("\n".join(lines))
    ds = PhnmArticDataset(
        str(filelist), data_root_dir=str(root), artic_subdir="encoded"
    )
    item = ds[0]
    assert item["x"].shape == (5, 25)  # diphthong split -> 5 rows
    durations = ds.get_durations(str(phnm_dir / "utt000_phnm3.npy"))
    assert len(durations) == 5  # diphthong halved
    np.testing.assert_allclose(durations.sum(), 0.6 * 50, atol=1e-4)


def test_pad_batch_buckets(corpus):
    root, filelist = corpus
    ds = TextMelDataset(filelist, CMU_PATH, data_root_dir=str(root))
    batch = pad_batch([ds[i] for i in range(4)], min_frames=104)
    B, T_x = batch["x"].shape
    assert B == 4
    assert T_x in (32, 64, 96, 128, 192, 256, 384, 512)
    assert batch["y"].shape[1] % 4 == 0
    assert batch["y"].shape[1] >= 104
    assert (batch["x_lengths"] <= T_x).all()


def test_bucket_batcher_properties():
    lengths = np.arange(100)
    b = BucketBatcher(lengths, batch_size=8, seed=0)
    batches = list(b)
    assert all(len(x) == 8 for x in batches)
    seen = np.concatenate(batches)
    assert len(np.unique(seen)) == len(seen)
    # first batch contains the longest item of all emitted batches
    assert lengths[batches[0]].max() == max(lengths[x].max() for x in batches)
    # multi-host: every host sees the SAME global batches, split row-wise —
    # concatenating the per-host slices reconstructs each global batch
    b0 = list(BucketBatcher(lengths, 8, seed=0, host_id=0, num_hosts=2))
    b1 = list(BucketBatcher(lengths, 8, seed=0, host_id=1, num_hosts=2))
    assert len(b0) == len(b1) == len(batches)
    for g, h0, h1 in zip(batches, b0, b1):
        assert len(h0) == len(h1) == 4
        np.testing.assert_array_equal(np.concatenate([h0, h1]), g)


def test_multihost_loader_reconstructs_global_batch(corpus):
    """Per-host loaders (fixed pad shapes) emit row slices whose
    concatenation equals the single-host batch — the data-side contract of
    `assemble_global_batch` (jax.make_array_from_process_local_data)."""
    root, filelist = corpus
    ds = TextMelDataset(filelist, CMU_PATH, data_root_dir=str(root), shuffle=False)
    kw = dict(batch_size=2, min_frames=104, text_bucket=256, frame_bucket=512,
              shuffle=False, prefetch=0)
    global_batches = list(DataLoader(ds, **kw))
    host_batches = [
        list(DataLoader(ds, host_id=h, num_hosts=2, **kw)) for h in range(2)
    ]
    assert len(host_batches[0]) == len(global_batches)
    for i, g in enumerate(global_batches):
        for key in ("x", "y", "x_lengths", "y_lengths"):
            stitched = np.concatenate(
                [host_batches[0][i][key], host_batches[1][i][key]], axis=0
            )
            np.testing.assert_array_equal(stitched, g[key])
        assert host_batches[0][i]["x"].shape[1] == 256  # fixed buckets agree
        assert host_batches[0][i]["y"].shape[1] == 512


def test_multihost_loader_requires_fixed_buckets():
    with pytest.raises(ValueError):
        DataLoader([], batch_size=2, num_hosts=2)


def test_assemble_global_batch_single_process():
    import jax

    from arttts_tpu.parallel.mesh import assemble_global_batch, make_mesh

    mesh = make_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    out = assemble_global_batch(mesh, batch)  # degenerates to shard_batch
    assert out["x"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert len(out["x"].sharding.device_set) == jax.device_count()


def test_dataloader_end_to_end(corpus):
    root, filelist = corpus
    ds = TextMelDataset(filelist, CMU_PATH, data_root_dir=str(root))
    dl = DataLoader(ds, batch_size=2, min_frames=104)
    batches = list(dl)
    assert len(batches) == 3
    for batch in batches:
        assert set(batch) >= {"x", "x_lengths", "y", "y_lengths"}
        assert batch["y"].shape[1] >= 104


def test_dataloader_language_upsample():
    """Multilingual loader with temperature-based language upsampling."""

    class LangDS:
        lang_sizes = [40, 8]

        def __len__(self):
            return 48

        def lengths(self):
            return np.arange(48) % 7 + 3

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                "x": r.integers(1, 9, size=(4,)).astype(np.int32),
                "y": r.standard_normal((12, 4)).astype(np.float32),
            }

    from arttts_tpu.data.batching import DataLoader

    dl = DataLoader(LangDS(), batch_size=4, language_upsample=0.5, prefetch=0)
    batches = list(dl)
    assert len(batches) == 12
    for b in batches:
        assert b["x"].shape[0] == 4


def test_phnm_mel_dataset(corpus, tmp_path):
    """v3 dataset: phnm3 traits + mel target + frame durations."""
    from arttts_tpu.data.datasets import PhnmMelDataset

    root, _ = corpus
    phnm_dir = root / "phnm3_mel"
    phnm_dir.mkdir(exist_ok=True)
    lines = []
    for i in range(2):
        phones = np.array(
            [(0.0, 0.2, "h"), (0.2, 0.5, "ə"), (0.5, 0.7, "aɪ")],
            dtype=[("start", "f4"), ("end", "f4"), ("phone", "U8")],
        )
        fp = phnm_dir / f"utt{i:03d}_phnm3.npy"
        np.save(fp, phones)
        lines.append(f"{root}/wavs/utt{i:03d}.wav|{fp}")
    filelist = tmp_path / "pm.txt"
    filelist.write_text("\n".join(lines))
    ds = PhnmMelDataset(
        str(filelist), data_root_dir=str(root), mel_cache_dir=str(tmp_path / "mc")
    )
    item = ds[0]
    assert item["x"].shape[1] == 25  # ternary traits
    assert item["y"].shape[1] == 80  # mel
    assert len(item["durations"]) == 4  # diphthong halved
    np.testing.assert_allclose(item["durations"].sum(), 0.7 * 50, atol=1e-3)
