"""panphon drop-in path: `ipa_features.load_table` swaps the trait table for
an external panphon-format file and every consumer follows it.

The reference embeds text with panphon's exact ternary vectors
(`/root/reference/src/text/converters.py:149-188`) and builds the
multilingual inventory from panphon's segment table
(`/root/reference/src/voxcommunis/decoder.py:88-89`). panphon cannot be
installed here, so parity with reference-trained ipa_trait checkpoints is
restored by loading panphon's `ipa_all.csv` through this path — these tests
prove the swap propagates end-to-end with a small fabricated csv whose
values intentionally differ from the built-in table.
"""

import numpy as np
import pytest

from arttts_tpu.text import ipa_features as feat
from arttts_tpu.text.ipa_features import (
    TRAITS,
    load_table,
    reset_table,
    segment_features,
    word_features,
)

# a fabricated "panphon-style" table: same trait names/order as panphon,
# values deliberately DIFFERENT from the built-in hand-authored table,
# including a pre-composed diacritic row (panphon pre-expands those).
# Like panphon's, the rows are DENSE (every trait specified, default -1) —
# `find_segment`'s least-zeros tie-break assumes that.
FAKE_ROWS = {
    "t": {"cons": 1, "ant": 1, "cor": 1},
    "a": {"syl": 1, "son": 1, "lo": 1, "tense": 1, "voi": 1},
    "tʰ": {"cons": 1, "ant": 1, "cor": 1, "sg": 1, "strid": 1},  # NOT t+mod
    "t͡ʃ": {"cons": 1, "delrel": 1, "distr": 1},
    "ʊ": {"syl": 1, "son": 1, "hi": 1, "round": 1},
}


def _vec(seg):
    return np.array(
        [FAKE_ROWS[seg].get(t, -1) for t in TRAITS], dtype=np.int8
    )


def _csv_text():
    lines = ["ipa," + ",".join(TRAITS)]
    for seg in FAKE_ROWS:
        row = [seg] + [
            {1: "+", -1: "-", 0: "0"}[int(v)] for v in _vec(seg)
        ]
        lines.append(",".join(row))
    return "\n".join(lines) + "\n"


@pytest.fixture
def swapped_table(tmp_path):
    p = tmp_path / "ipa_all.csv"
    p.write_text(_csv_text(), encoding="utf-8")
    n = load_table(str(p))
    assert n >= len(FAKE_ROWS)
    yield p
    reset_table()


def test_segment_features_follow_loaded_table(swapped_table):
    np.testing.assert_array_equal(segment_features("t"), _vec("t"))
    np.testing.assert_array_equal(segment_features("a"), _vec("a"))
    # pre-composed row wins over base+diacritic composition
    np.testing.assert_array_equal(segment_features("tʰ"), _vec("tʰ"))
    # a diacritic NOT pre-composed in the file still composes over the
    # loaded base values (ʲ sets hi=+1 on the loaded "t")
    tj = segment_features("tʲ")
    expect = _vec("t").copy()
    expect[TRAITS.index("hi")] = 1
    np.testing.assert_array_equal(tj, expect)
    # replace=True cleared the built-in table: built-in-only segments are
    # unknown now
    assert segment_features("ŋ") is None
    # multi-segment parse uses loaded rows
    np.testing.assert_array_equal(
        word_features("ta"), np.stack([_vec("t"), _vec("a")])
    )


def test_reset_table_restores_builtin(swapped_table):
    reset_table()
    assert segment_features("ŋ") is not None
    t = segment_features("t")
    assert t[TRAITS.index("strid")] == 0  # built-in value, not the fake -1
    # reload for the fixture's teardown symmetry
    load_table(str(swapped_table))


def test_ipa_to_ternary_follows_loaded_table(swapped_table):
    from arttts_tpu.text.converters import ipa_to_ternary

    emb = ipa_to_ternary(["t%a", " ", "a"], merge_diphtongues=False)
    assert emb.shape == (4, 25)
    np.testing.assert_array_equal(emb[0, :24], _vec("t").astype(np.float32))
    np.testing.assert_array_equal(emb[1, :24], _vec("a").astype(np.float32))
    assert emb[2, 24] == -1  # space token untouched by the swap
    # diphthong agreement-merge over LOADED values
    emb2 = ipa_to_ternary(["aʊ"], merge_diphtongues=True)
    a, u = _vec("a").astype(np.float32), _vec("ʊ").astype(np.float32)
    np.testing.assert_array_equal(emb2[0, :24], np.where(a == u, a, 0.0))


def test_decoder_and_tokenizer_follow_loaded_table(swapped_table):
    from arttts_tpu.voxcommunis.data import FeatureTokenizer
    from arttts_tpu.voxcommunis.decoder import FeatureDecoder

    dec = FeatureDecoder(sum_diphthong=True)  # multilingual: whole table
    # the inventory is exactly the loaded table (plus the zero tone)
    assert set(FAKE_ROWS) <= set(dec.segments)
    for seg in FAKE_ROWS:
        row = dec.features[dec.segment_id(seg)]
        np.testing.assert_array_equal(row, _vec(seg).astype(np.int64))
    # inverse lookup returns the loaded representative
    assert dec.find_segment(tuple(int(v) for v in _vec("tʰ"))) == "tʰ"

    tok = FeatureTokenizer(dec)
    _, rows = tok.ipa_to_features("t")
    np.testing.assert_array_equal(rows[0], _vec("t").astype(np.float32))
    feats, reps = tok.encode(["SIL", "t", "a"], [2, 3, 1])
    assert feats.shape == (6, 24)
    np.testing.assert_array_equal(feats[2], _vec("t").astype(np.float32))
    np.testing.assert_array_equal(feats[5], _vec("a").astype(np.float32))


def test_dataset_follows_loaded_table(swapped_table, tmp_path, rng):
    """End-to-end: a voxcommunis dataset built after the swap produces
    feature rows from the loaded table (the path reference-trained v6
    checkpoints need)."""
    from arttts_tpu.audio.io import save_wav
    from arttts_tpu.data.ms_datasets import MsPhnmArticDataset
    from arttts_tpu.voxcommunis.data import FeatureTokenizer
    from arttts_tpu.voxcommunis.decoder import FeatureDecoder
    from arttts_tpu.voxcommunis.io import write_manifest

    lang = "ab"
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    enc_dir = tmp_path / "encoded_audio_multi" / lang
    (enc_dir / "emasrc").mkdir(parents=True)
    (enc_dir / "spk_preemb").mkdir(parents=True)
    fid = f"cv_ab_{lang}_0000"
    save_wav(wavs / f"{fid}.wav", rng.standard_normal(1600) * 0.1, 16000)
    T = 40
    np.save(enc_dir / "emasrc" / f"{fid}.npy",
            rng.standard_normal((T, 14)).astype(np.float32))
    np.save(enc_dir / "spk_preemb" / f"{fid}.npy",
            rng.standard_normal(1024).astype(np.float32))
    phones = ["SIL"] * 20 + ["t"] * 30 + ["a"] * 30
    write_manifest(wavs, tmp_path / "man.tsv")
    (tmp_path / "align.align").write_text(f"{fid}\t{' '.join(phones)}\n")

    tok = FeatureTokenizer(FeatureDecoder(sum_diphthong=True))
    ds = MsPhnmArticDataset(
        tmp_path, tmp_path / "man.tsv", tmp_path / "align.align", tok
    )
    x = ds[0]["x"]  # (n_phones, 26): 24 traits + silence + counts
    np.testing.assert_array_equal(x[1, :24], _vec("t").astype(np.float32))
    np.testing.assert_array_equal(x[2, :24], _vec("a").astype(np.float32))


def test_npz_round_trip(tmp_path, swapped_table):
    """The npz format loads the same values the csv did."""
    segs = np.array(list(FAKE_ROWS), dtype="U8")
    vals = np.stack([_vec(s) for s in FAKE_ROWS]).astype(np.int8)
    p = tmp_path / "table.npz"
    np.savez(p, segments=segs, values=vals)
    reset_table()
    n = load_table(str(p))
    assert n == len(FAKE_ROWS)
    np.testing.assert_array_equal(segment_features("t͡ʃ"), _vec("t͡ʃ"))


def test_builtin_table_unchanged_by_default():
    """No swap active: the module exposes the built-in table (guards
    fixture hygiene across this file)."""
    assert feat.SEGMENTS.keys() == feat._BUILTIN_SEGMENTS.keys()
