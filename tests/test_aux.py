"""Auxiliary subsystem tests: profiling, EMA metadata pipeline, encode_audio
sharding, checkpoint helpers."""

import numpy as np
import pytest


def test_step_timer():
    import time

    from arttts_tpu.utils.profiling import StepTimer

    t = StepTimer(sync_every=2)
    for _ in range(5):
        t.start()
        time.sleep(0.001)
        t.stop()
    s = t.summary()
    assert s["steps"] == 4  # first (compile) step dropped
    assert s["mean_s"] > 0


def test_speaker_metadata_pipeline(tmp_path):
    from arttts_tpu.corpora.ema_metadata import SpeakerMetadata, ema_validity

    # synthetic pb2007-style corpus
    labels = tmp_path / "labels"
    emas = tmp_path / "ema"
    labels.mkdir()
    emas.mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        (labels / f"s{i:03d}.phone").write_text("0 10 a\n10 30 s^\n")
        ema = rng.standard_normal((30, 12)).astype(np.float32)
        if i == 3:
            ema[:, 0] = np.nan  # invalid sentence
        ema.tofile(emas / f"s{i:03d}.bin")

    meta = SpeakerMetadata("pb2007", "spk1", str(tmp_path)).scan(
        str(labels), str(emas)
    )
    assert len(meta.sentences) == 10
    meta.extract_durations()
    assert abs(meta.sentences[0].duration - 0.3) < 1e-6
    meta.validate_ema()
    assert not meta.sentences[3].valid
    assert len(meta.list_valid_ids()) == 9
    meta.set_splits(val_frac=0.2, test_frac=0.2)
    splits = {s.split for s in meta.get_sentences() if s.valid}
    assert splits == {"train", "val", "test"}
    X, y = meta.agg_Xy_split("train")
    assert len(X) == len(y) > 0

    # PCC against itself at 50 Hz is 1
    sid = meta.list_valid_ids()[0]
    sparc = meta.get_src_ema(sid, dst_rate=50.0)
    assert abs(meta.compute_sentence_pcc(sid, sparc) - 1.0) < 1e-6

    # persistence round trip
    meta.save(tmp_path / "meta.pkl")
    again = SpeakerMetadata.load(tmp_path / "meta.pkl")
    assert len(again.sentences) == 10
    meta.to_json(tmp_path / "meta.json")
    assert (tmp_path / "meta.json").exists()

    assert ema_validity(np.zeros((10, 2)))
    assert not ema_validity(np.full((10, 2), np.nan))


def test_encode_audio_dry_run_sharding(tmp_path, capsys):
    from arttts_tpu.cli.encode_audio import main

    filelist = tmp_path / "list.txt"
    filelist.write_text("\n".join(f"wavs/u{i}.wav|text" for i in range(10)))
    main([
        "--manifest", str(filelist),
        "--save-dir", str(tmp_path / "enc"),
        "--shard-id", "1", "--num-shards", "3",
        "--dry-run",
    ])
    assert (tmp_path / "enc" / "emasrc").exists()


def test_latest_checkpoint(tmp_path):
    from arttts_tpu.core.checkpoint import latest_checkpoint

    (tmp_path / "grad_2").mkdir()
    (tmp_path / "grad_10").mkdir()
    (tmp_path / "grad_best").mkdir()
    assert latest_checkpoint(str(tmp_path)).endswith("grad_10")
    assert latest_checkpoint(str(tmp_path / "missing")) is None
