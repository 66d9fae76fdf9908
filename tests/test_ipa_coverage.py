"""Every IPA value emitted by the corpus tables and the ARPAbet map must
parse into trait rows (no silent drops in the embedder)."""

import pytest

from arttts_tpu.corpora.tables import MNGU0_TO_IPA, MSPKA_TO_IPA, PB2007_TO_IPA
from arttts_tpu.text.converters import ARPABET2IPA, DIPHTHONGS_IPA
from arttts_tpu.text.ipa_features import word_features


def _check_table(table):
    missing = []
    for src, ipa in table.items():
        if ipa == ".":  # silence/punct handled by the 25th dim
            continue
        if word_features(ipa) is None:
            missing.append((src, ipa))
    assert not missing, f"unparseable IPA: {missing}"


def test_arpabet_coverage():
    _check_table(ARPABET2IPA)


def test_mngu0_coverage():
    _check_table(MNGU0_TO_IPA)


def test_mspka_coverage():
    _check_table(MSPKA_TO_IPA)


def test_pb2007_coverage():
    _check_table(PB2007_TO_IPA)


def test_diphthong_components():
    for d in DIPHTHONGS_IPA:
        feats = word_features(d)
        assert feats is not None and feats.shape[0] == 2, d


def test_tone_letters():
    for tone in "˥˦˧˨˩":
        assert word_features(tone) is not None
    # mid tone is the all-zero vector (multilingual silence representative)
    assert (word_features("˧") == 0).all()
