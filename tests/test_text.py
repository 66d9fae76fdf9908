"""Text frontend tests: cleaners, number normalization, symbol encoding,
ARPAbet->IPA->ternary conversion."""

import os

import numpy as np
import pytest

from arttts_tpu.text.cleaners import english_cleaners, english_cleaners_v2
from arttts_tpu.text.cmudict import CMUDict
from arttts_tpu.text.converters import (
    ARPABET2IPA,
    EMB_DIM,
    get_ipa_from_arp,
    ipa_to_ternary,
    text_to_arpabet,
    text_to_ipa,
)
from arttts_tpu.text.ipa_features import SEGMENTS, segment_features
from arttts_tpu.text.numbers import normalize_numbers
from arttts_tpu.text.sequence import intersperse, sequence_to_text, text_to_sequence
from arttts_tpu.text.symbols import n_symbols_with_blank, symbols

CMU_PATH = os.path.join(
    os.path.dirname(__file__), "..", "arttts_tpu", "resources", "cmu_dictionary"
)


@pytest.fixture(scope="module")
def cmudict():
    return CMUDict(CMU_PATH)


def test_symbol_inventory_size():
    # 1 pad + 1 special + 10 punctuation + 52 letters + 84 arpabet = 148
    assert len(symbols) == 148
    assert n_symbols_with_blank() == 149
    assert len(set(symbols)) == len(symbols)


def test_number_normalization():
    assert normalize_numbers("1864") == "eighteen sixty-four"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2005") == "two thousand five"
    assert normalize_numbers("100") == "one hundred"
    assert normalize_numbers("14") == "fourteen"
    assert normalize_numbers("$5") == "five dollars"
    assert "point" in normalize_numbers("3.14")
    assert normalize_numbers("3rd") == "third"
    assert normalize_numbers("22nd") == "twenty-second"


def test_english_cleaners():
    assert english_cleaners("Dr. Smith bought 2 apples.") == (
        "doctor smith bought two apples."
    )
    out = english_cleaners_v2("Hello, world!")
    assert out == "hello , world !"


def test_text_to_sequence_roundtrip(cmudict):
    seq = text_to_sequence("printing", dictionary=cmudict)
    assert len(seq) > 0
    txt = sequence_to_text(seq)
    assert "P" in txt and "R" in txt  # arpabet phones present

    seq_nodict = text_to_sequence("hello world")
    assert sequence_to_text(seq_nodict) == "hello world"


def test_intersperse():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]


def test_arpabet_to_ipa_table_covers_cmu():
    # every unstressed CMU phone has a mapping
    from arttts_tpu.text.cmudict import VALID_ARPABET

    for p in VALID_ARPABET:
        base = p.replace("1", "").replace("2", "").replace("0", "")
        covered = (
            p in ARPABET2IPA
            or base in ARPABET2IPA
            # bare vowels like "AH" only occur stressed in CMUdict entries;
            # the reference table likewise only maps the stressed variants
            or all(base + s in ARPABET2IPA for s in ("0", "1", "2"))
        )
        assert covered, p


def test_ipa_segments_distinct():
    # segments written with ASCII "g" are aliases of their IPA "ɡ" twins
    aliases = {s for s in SEGMENTS if "g" in s and s.replace("g", "ɡ") in SEGMENTS}
    vecs = {}
    for seg in set(SEGMENTS) - aliases:
        v = tuple(segment_features(seg).tolist())
        assert v not in vecs, f"{seg} collides with {vecs.get(v)}"
        vecs[v] = seg


def test_rhotic_modifier():
    v1 = segment_features("ɜ")
    v2 = segment_features("ɜ˞")
    assert v2 is not None and not np.array_equal(v1, v2)


def test_text_to_ipa_and_ternary(cmudict):
    ipa = text_to_ipa("printing, again.", dictionary=cmudict)
    assert ipa is not None
    # the data layer intersperses " " word separators (ref data.py:87-102)
    ipa_sp = [" "] * (len(ipa) * 2 + 1)
    ipa_sp[1::2] = ipa
    tern = ipa_to_ternary(ipa_sp, merge_diphtongues=False)
    assert tern.ndim == 2 and tern.shape[1] == EMB_DIM
    assert set(np.unique(tern)).issubset({-1.0, 0.0, 1.0})
    # punctuation token present ("," and ".")
    assert (tern[:, -1] == 1).sum() == 2
    # space token present
    assert (tern[:, -1] == -1).sum() >= 1


def test_diphthong_merge(cmudict):
    ipa_word = get_ipa_from_arp("{AY1}")
    merged = ipa_to_ternary([ipa_word], merge_diphtongues=True)
    split = ipa_to_ternary([ipa_word], merge_diphtongues=False)
    assert merged.shape[0] == 1
    assert split.shape[0] == 2


def test_text_to_arpabet_dash(cmudict):
    words = text_to_arpabet("sixty-four", dictionary=cmudict)
    assert all(w.startswith("{") or not w.strip("{}") for w in words if w not in [","])
