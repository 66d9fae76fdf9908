"""VoxCommunis phonological-feature tokenization and datasets.

Equivalent of `/root/reference/src/voxcommunis/data.py:226-435`: a
`FeatureTokenizer` that turns IPA phone strings into 24-dim feature rows
(multi-segment phones spread over their repetition counts), a
`PanPhonInventory` that applies a correction map and downsamples 100 Hz
alignment frames to the 50 Hz model rate, and `PhoneticFeatureDataset`
producing (24 traits + silence + repetition-count) = 26-dim rows.
"""

from __future__ import annotations

import pickle
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from arttts_tpu.voxcommunis.decoder import FeatureDecoder
from arttts_tpu.voxcommunis.io import read_alignment, read_manifest
from arttts_tpu.voxcommunis.utils import unique_consecutive

SAMPLE_RATE = 16_000
ALIGNMENT_FREQ = 100  # Hz
MODEL_FREQ = 50  # Hz
SUBSAMPLE = ALIGNMENT_FREQ // MODEL_FREQ

# CommonVoice language code -> English name (subset of the reference's map;
# extend as corpora are added).
LANGUAGES: Dict[str, str] = {
    "ab": "Abkhaz", "af": "Afrikaans", "am": "Amharic", "ar": "Arabic",
    "as": "Assamese", "az": "Azerbaijani", "ba": "Bashkir", "bas": "Basaa",
    "be": "Belarusian", "bg": "Bulgarian", "bn": "Bengali", "br": "Breton",
    "ca": "Catalan", "ckb": "Central Kurdish", "cnh": "Hakha Chin",
    "cs": "Czech", "cv": "Chuvash", "cy": "Welsh", "da": "Danish",
    "de": "German", "dv": "Dhivehi", "el": "Greek", "en": "English",
    "eo": "Esperanto", "es": "Spanish", "et": "Estonian", "eu": "Basque",
    "fa": "Persian", "fi": "Finnish", "fr": "French", "fy-NL": "Frisian",
    "ga-IE": "Irish", "gl": "Galician", "gn": "Guarani", "ha": "Hausa",
    "he": "Hebrew", "hi": "Hindi", "hsb": "Sorbian, Upper", "hu": "Hungarian",
    "hy-AM": "Armenian", "ia": "Interlingua", "id": "Indonesian",
    "ig": "Igbo", "it": "Italian", "ja": "Japanese", "ka": "Georgian",
    "kab": "Kabyle", "kk": "Kazakh", "kmr": "Kurmanji Kurdish",
    "ko": "Korean", "ky": "Kyrgyz", "lg": "Luganda", "lt": "Lithuanian",
    "lv": "Latvian", "mdf": "Moksha", "mhr": "Meadow Mari", "mk": "Macedonian",
    "ml": "Malayalam", "mn": "Mongolian", "mr": "Marathi", "mrj": "Hill Mari",
    "mt": "Maltese", "myv": "Erzya", "nan-tw": "Taiwanese (Minnan)",
    "nl": "Dutch", "nn-NO": "Norwegian Nynorsk", "or": "Odia",
    "pa-IN": "Punjabi", "pl": "Polish", "pt": "Portuguese",
    "rm-sursilv": "Romansh Sursilvan", "rm-vallader": "Romansh Vallader",
    "ro": "Romanian", "ru": "Russian", "rw": "Kinyarwanda", "sah": "Sakha",
    "sat": "Santali", "sc": "Sardinian", "sk": "Slovak", "skr": "Saraiki",
    "sl": "Slovenian", "sr": "Serbian", "sv-SE": "Swedish", "sw": "Swahili",
    "ta": "Tamil", "th": "Thai", "ti": "Tigrinya", "tig": "Tigre",
    "tok": "Toki Pona", "tr": "Turkish", "tt": "Tatar", "tw": "Twi",
    "ug": "Uyghur", "uk": "Ukrainian", "ur": "Urdu", "uz": "Uzbek",
    "vi": "Vietnamese", "vot": "Votic", "yue": "Cantonese",
    "zh-CN": "Chinese (China)", "zh-HK": "Chinese (Hong Kong)",
    "zh-TW": "Chinese (Taiwan)",
}


class FeatureTokenizer:
    """IPA phone -> representative form + (n_components, 24) feature rows
    (data.py:226-353); `encode` spreads multi-segment phones over their
    repetition counts with rounded boundaries."""

    def __init__(self, feature_decoder: FeatureDecoder):
        self._feat_decoder = feature_decoder

    @property
    def num_features(self) -> int:
        return len(self._feat_decoder.header)

    @property
    def multilingual_mode(self) -> bool:
        return self._feat_decoder.multilingual_mode

    @lru_cache(maxsize=None)
    def ipa_to_features(self, ipa_phone: str) -> Tuple[Tuple[str, ...], np.ndarray]:
        rep = self._feat_decoder.segment_to_representative(ipa_phone)
        rep, vector = self._feat_decoder.canonical_representation(rep)
        return rep, vector.astype(np.float32)

    def encode(
        self, ipa_phones: Sequence[str], counts: Sequence[int]
    ) -> Tuple[np.ndarray, List[str]]:
        """Expand phones into per-frame feature rows. A phone held for
        ``counts[i]`` frames repeats its vector; a k-component phone splits
        its frames into k near-equal runs (half-to-even rounded boundaries,
        matching ref data.py:304-338 semantics)."""
        if len(counts) != len(ipa_phones):
            raise ValueError(
                f"Length mismatch between IPA phones ({len(ipa_phones)}) and "
                f"counts ({len(counts)})"
            )
        chunks: List[np.ndarray] = []
        frame_phones: List[str] = []
        for phone, frames in zip(ipa_phones, counts):
            names, vectors = self.ipa_to_features(phone)
            k = len(names)
            edges = np.rint(np.arange(k + 1) * frames / k).astype(np.int64)
            runs = np.diff(edges)
            chunks.append(np.repeat(vectors, runs, axis=0))
            frame_phones.extend(np.repeat(np.asarray(names, dtype=object), runs))
        return np.concatenate(chunks, axis=0), frame_phones

    def decode(self, tokens: np.ndarray) -> List[str]:
        """Feature rows -> segments via the decoder's inverse lookup."""
        return [
            self._feat_decoder.find_segment(tuple(int(v) for v in row))
            for row in np.asarray(tokens)
        ]


class PanPhonInventory:
    """Correction-map application + 100->50 Hz downsampling (data.py:356-368).

    The reference loads `correction_map.pickle`; pass a dict or pickle path,
    default empty."""

    def __init__(self, corrections: Optional[object] = None):
        if corrections is None:
            self._corrections: Dict[str, str] = {}
        elif isinstance(corrections, (str, Path)):
            with open(corrections, "rb") as fp:
                self._corrections = pickle.load(fp)
        else:
            self._corrections = dict(corrections)

    def convert_to_ipa(self, panphon_phones) -> str:
        if isinstance(panphon_phones, str):
            panphon_phones = panphon_phones.split(" ")
        panphon_phones = panphon_phones[::SUBSAMPLE]
        return " ".join(self._corrections.get(p, p) for p in panphon_phones)


def phonological_feature_rows(
    phones_str: str, tokenizer: FeatureTokenizer
) -> np.ndarray:
    """Aligned phone string -> (seq_len, 26) rows: 24 traits + silence trait
    (+1 sil / -1 speech) + frame repetition count (data_ms.py:110-124)."""
    phones = phones_str.split(" ")
    phones, counts = unique_consecutive(phones, return_counts=True)
    ones = [1] * len(phones)
    feats, _ = tokenizer.encode(phones, ones)
    sil = (np.all(feats == 0, axis=1) * 2 - 1).astype(np.float32)[:, None]
    cnt = np.asarray(counts, np.float32)[:, None]
    return np.concatenate([feats, sil, cnt], axis=1)


class PhoneticFeatureDataset:
    """Standalone phonological-feature dataset (data.py:371-435)."""

    def __init__(
        self,
        manifest_path,
        alignment_path,
        feature_tokenizer: FeatureTokenizer,
        separate_files: bool = False,
        corrections=None,
    ):
        self.feature_tokenizer = feature_tokenizer
        inv = PanPhonInventory(corrections)
        if separate_files:
            manifests = sorted(Path(manifest_path).glob("*.tsv"))
            self.langs = [fp.stem for fp in manifests]
            self.lang_sizes: List[int] = []
            self.manifest: List = []
            self.ipa_phones: Dict[str, str] = {}
            for man_path in manifests:
                man = read_manifest(man_path)
                self.manifest += list(man.items())
                self.lang_sizes.append(len(man))
            for lang in self.langs:
                aligns = read_alignment(Path(alignment_path) / f"{lang}.align")
                self.ipa_phones.update(
                    {f: inv.convert_to_ipa(a) for f, a in aligns.items()}
                )
        else:
            man = read_manifest(manifest_path)
            self.manifest = list(man.items())
            aligns = read_alignment(alignment_path)
            assert feature_tokenizer.multilingual_mode
            self.ipa_phones = {f: inv.convert_to_ipa(a) for f, a in aligns.items()}

    def __len__(self) -> int:
        return len(self.manifest)

    def __getitem__(self, idx: int):
        file_id, (path, num_samples) = self.manifest[idx]
        feats = phonological_feature_rows(
            self.ipa_phones[file_id], self.feature_tokenizer
        )
        return feats, file_id
