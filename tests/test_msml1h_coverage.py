"""Multilingual featurization coverage for the msml1h language sweep.

The reference tokenizes VoxCommunis alignments through panphon's full
segment table; unknown segments silently become zero (silence) vectors
(`src/voxcommunis/decoder.py:34-40`). Our native trait table
(`text/ipa_features.py`) must parse representative phone inventories for
the msml1h languages (`src/configs/params_msml1h.py:87-160`) within a small
zero-vector-fallback budget, so multilingual models don't silently see
silence where there is speech.
"""

import numpy as np

from arttts_tpu.core.config import MSML1H_LANG_CODES
from arttts_tpu.text.ipa_features import word_features
from arttts_tpu.voxcommunis.data import LANGUAGES, FeatureTokenizer
from arttts_tpu.voxcommunis.decoder import FeatureDecoder

# Characteristic phone inventories (broad IPA as produced by the VoxCommunis
# MFA alignments) for languages in the msml1h sweep. Not exhaustive — a
# representative sample of each language's distinctive segments.
REPRESENTATIVE_PHONES = {
    "ka": ["pʼ", "tʼ", "kʼ", "qʼ", "t͡sʼ", "t͡ʃʼ", "χ", "ʁ", "ɣ", "d͡z"],
    "ja": ["ɸ", "t͡s", "d͡ʑ", "ɕ", "ɲ", "ɯ", "ç"],
    "hi": ["ʈ", "ɖ", "ɳ", "ɽ", "bʱ", "dʱ", "ɡʱ", "d͡ʒʱ", "t̪", "d̪", "ə"],
    "ro": ["t͡s", "ʃ", "ʒ", "ɨ", "ə", "e̯", "o̯"],
    "uz": ["q", "ʁ", "χ", "d͡ʒ", "ŋ", "ɔ"],
    "tt": ["q", "ʁ", "ɕ", "ʑ", "ɵ", "æ", "ɤ"],
    "el": ["θ", "ð", "ɣ", "ç", "ʝ", "c", "ɟ"],
    "sr": ["t͡s", "t͡ʃ", "d͡ʒ", "t͡ɕ", "d͡ʑ", "ʎ", "ɲ", "r"],
    "mt": ["ħ", "ʔ", "t͡s", "d͡z", "ʃ", "ɛ"],
    "be": ["t͡s", "d͡z", "ʂ", "ʐ", "ɣ", "sʲ", "zʲ", "t͡sʲ"],
    "uk": ["ɦ", "t͡s", "d͡z", "ʃ", "ʒ", "ɪ", "ʋ"],
    "hy-AM": ["pʰ", "tʰ", "kʰ", "t͡sʰ", "t͡ʃʰ", "ʁ", "χ", "ɾ"],
    "ckb": ["q", "ħ", "ʕ", "ɣ", "ɫ", "ɾ", "r"],
    "tr": ["ɯ", "œ", "y", "ɟ", "c", "ʒ", "ɫ"],
    "vi": ["ɗ", "ɓ", "ɲ", "ŋ", "ɤ", "ɯ", "ə", "t̪"],
    "bg": ["t͡s", "ʃ", "ʒ", "x", "ɤ", "ɫ"],
    "ta": ["ʈ", "ɳ", "ɻ", "ɾ", "r", "ʂ", "d̪"],
    "sv-SE": ["ɕ", "ʂ", "ɖ", "ʈ", "ɵ", "ʉ", "øː"],
    "id": ["ɲ", "ŋ", "d͡ʒ", "t͡ʃ", "ʔ", "ə"],
    "sw": ["ɓ", "ɗ", "ɠ", "v", "ð", "ɣ", "t͡ʃ"],
    "kmr": ["q", "x", "ʁ", "ħ", "ɫ", "r"],
    "dv": ["ʈ", "ɖ", "ɳ", "ɭ", "ʂ", "f"],
    "ha": ["ɓ", "ɗ", "kʼ", "t͡sʼ", "ʔ", "ɽ"],
    "zh-CN": ["ʈ͡ʂ", "ʈ͡ʂʰ", "ʂ", "ʐ", "t͡ɕ", "t͡ɕʰ", "ɕ", "ɤ", "y", "˥", "˧˥", "˨˩˦", "˥˩"],
    "yue": ["t͡s", "t͡sʰ", "kʷ", "kʷʰ", "ɵ", "ɐ", "˥", "˨", "˧"],
    "fr": ["ʁ", "ɥ", "ø", "œ", "ɑ̃", "ɛ̃", "ɔ̃", "œ̃"],
    "cv": ["ɕ", "ʂ", "ɯ", "ɤ", "x"],
    "ko": ["pʼ", "tʼ", "kʼ", "sʼ", "t͡ɕ", "ɯ", "ʌ"],
    "nl": ["ɣ", "x", "ʋ", "œ", "ø", "ʏ"],
    "ug": ["q", "ʁ", "χ", "ʒ", "ø", "y"],
    "mr": ["ʈ", "ɖ", "ɳ", "ɭ", "bʱ", "d̪ʱ", "t͡s", "d͡z"],
    "ab": ["t͡ɕ", "ʕ", "qʼ", "t͡sʼ", "ʂ", "ʐ", "ħ"],
    "it": ["t͡s", "d͡z", "t͡ʃ", "d͡ʒ", "ʎ", "ɲ", "r"],
    "lt": ["t͡s", "d͡z", "ʃ", "ʒ", "ɛː", "oː", "uː"],
    "sl": ["t͡s", "t͡ʃ", "ʒ", "x", "ə", "r"],
    "pa-IN": ["ʈ", "ɖ", "ɳ", "t͡ʃ", "d͡ʒ", "ə", "ɪ"],
    "ru": ["ʂ", "ʐ", "t͡s", "t͡ɕ", "sʲ", "tʲ", "nʲ", "ɨ"],
    "cs": ["r̝", "t͡s", "t͡ʃ", "ɦ", "x", "iː"],
    "gn": ["ɨ", "ʔ", "ɲ", "ɰ", "ʋ"],
    "ml": ["ʈ", "ɳ", "ɭ", "ɻ", "t̪", "n̪", "ŋ"],
    "nan-tw": ["ʔ", "t͡s", "t͡sʰ", "ɔ", "ɐ̃", "˥", "˨"],
    "th": ["tʰ", "pʰ", "kʰ", "t͡ɕ", "t͡ɕʰ", "ɯ", "ɤ", "˥", "˩"],
    "pt": ["ʁ", "ɐ̃", "ɔ̃", "ʎ", "ɲ", "ɐ"],
    "ky": ["q", "ɢ", "ø", "y", "ŋ"],
    "pl": ["t͡s", "d͡z", "ʂ", "ʐ", "t͡ɕ", "d͡ʑ", "ɨ", "ɛ̃"],
    "ca": ["ʎ", "ɲ", "t͡s", "d͡ʒ", "ə", "ɔ"],
    "myv": ["t͡s", "t͡ɕ", "ʂ", "ʐ", "ɨ"],
    "hu": ["c", "ɟ", "t͡s", "t͡ʃ", "ø", "y", "øː"],
    "rw": ["β", "t͡s", "ʃ", "ɲ", "ŋ"],
    "am": ["tʼ", "kʼ", "t͡sʼ", "t͡ʃʼ", "ə", "ɨ"],
}


# r5 long-tail tranche: segments the r4 table could NOT parse — NFC
# precomposed nasal vowels, prenasalization prefixes (Bantu), click
# accompaniments, tone accents, rare consonants, stress marks.
LONG_TAIL_PHONES = {
    "pt": ["ĩ", "ũ", "ẽ", "õ", "ɐ̃w̃", "ɐ̃j̃"],       # NFC nasal vowels + diphthongs
    "rw": ["ᵐb", "ⁿd", "ᵑɡ", "ᶮd͡ʒ", "ŋ̍"],           # prenasalization, syllabic velar
    "sw": ["ᵐb", "ⁿd", "ᵑɡ", "ɓ", "ɗ"],
    "yo": ["á", "à", "ɔ́", "ɛ̀", "ŋ́", "k͡p", "ɡ͡b"],  # tone accents
    "ha": ["ʉ̀", " â", "ǎ"],
    "sv-SE": ["ɧ", "ʉ̟", "ä"],                        # sj-sound, centralized
    "cs": ["r̝", "ɺ"],
    "ar": ["ʡ", "ʜ", "ʢ", "dˤ", "sˤ", "tˤ"],          # epiglottals, emphatics
    "de": ["ʙ", "p͡f", "ˈa", "ˌa"],
    "nan-tw": ["ᵏǃ", "ⱱ", "y̑", "ʚ"],                 # rare/accompanied
}


def test_long_tail_phones_parse():
    """Every r5 long-tail segment parses to a non-None trait matrix."""
    failed = [
        (lang, ph)
        for lang, phones in LONG_TAIL_PHONES.items()
        for ph in phones
        if word_features(ph) is None
    ]
    assert not failed, f"long-tail phones unparseable: {failed}"


def test_nfc_nfd_equivalence():
    """Precomposed (NFC) and decomposed (NFD) spellings featurize alike."""
    import unicodedata

    for ph in ["ĩ", "ũ", "ẽ", "õ", "ä", "á", "à"]:
        nfd = unicodedata.normalize("NFD", ph)
        assert nfd != ph  # the pair is a real normalization difference
        np.testing.assert_array_equal(word_features(ph), word_features(nfd))


def test_msml1h_languages_in_map():
    """Every msml1h language code resolves in the LANGUAGES map."""
    missing = [c for c in MSML1H_LANG_CODES if c not in LANGUAGES]
    # "yo", "tk", "sq", "lij", "zh-HK", "mn", "bn", "sk" etc must be present
    assert not missing, f"msml1h codes missing from LANGUAGES: {missing}"


def test_languages_map_size():
    """Full reference inventory (205 codes, ref voxcommunis/data.py:17-223)."""
    assert len(LANGUAGES) >= 205


def test_representative_phones_parse():
    """Trait-table coverage with a zero-vector fallback budget (<= 2%)."""
    total, failed = 0, []
    for lang, phones in REPRESENTATIVE_PHONES.items():
        for ph in phones:
            total += 1
            if word_features(ph) is None:
                failed.append((lang, ph))
    budget = 0.02 * total
    assert len(failed) <= budget, (
        f"{len(failed)}/{total} representative phones unparseable "
        f"(budget {budget:.0f}): {failed}"
    )


def test_tokenizer_no_silent_zero_for_known_phones():
    """Parsed phones must not collapse to the all-zero (silence) vector
    unless they are tone letters."""
    tok = FeatureTokenizer(FeatureDecoder(sum_diphthong=True))
    zeroed = []
    for lang, phones in REPRESENTATIVE_PHONES.items():
        for ph in phones:
            if word_features(ph) is None or ph.startswith("˥") or ph[0] in "˥˦˧˨˩":
                continue
            _, vec = tok.ipa_to_features(ph)
            if not np.any(vec):
                zeroed.append((lang, ph))
    assert not zeroed, f"speech phones mapped to silence vectors: {zeroed}"
