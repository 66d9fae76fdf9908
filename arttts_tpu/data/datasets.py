"""Dataset classes for the single-speaker experiment versions.

Equivalents of the reference's dataset modules (`/root/reference/src/data.py`,
`data_phnm.py`, `data_textmel.py`, `data_textart.py`, `data_phnmmel.py`),
producing numpy items `{"x", "y"[, "durations"]}` in feature-last layout:

- TextArticDataset  (v0): text -> 25-dim ternary traits; SPARC art 16ch.
- PhnmArticDataset  (v1/v1_1/v5): phnm3 forced alignments -> traits; art.
- TextMelDataset    (v2): symbol ids (CMUdict + blanks); 80-mel from wav.
- PhnmMelDataset    (v3): phnm3 traits; mel; optional frame durations.
- TextArtDataset    (v4): symbol ids; art.

Mel extraction runs through the batched JAX pipeline
(`arttts_tpu/audio/mel.py`) with on-disk caching — the reference recomputes
mels in every DataLoader worker epoch (`data_textmel.py:71-93`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from arttts_tpu.audio.io import load_wav
from arttts_tpu.audio.mel import MelConfig, MelSpectrogram
from arttts_tpu.data.features import load_art_features
from arttts_tpu.data.filelist import parse_filelist
from arttts_tpu.text.cmudict import CMUDict
from arttts_tpu.text.converters import (
    DIPHTHONGS_IPA,
    ipa_to_ternary,
    text_to_ipa,
)
from arttts_tpu.text.sequence import intersperse, text_to_sequence
from arttts_tpu.text.symbols import symbols


def _resolve(fp: str, data_root_dir: str) -> str:
    """The reference filelists use a DUMMY/ prefix placeholder."""
    return fp.replace("DUMMY/", str(data_root_dir) + "/")


def _text_to_symbol_ids(text: str, cmudict: CMUDict, gradtts_text_conv: bool):
    """GradTTS direct symbol conversion, or the "phnmtext" ARPAbet-first path
    (ref data_textmel.py:95-107: text -> ARPAbet word list -> sequence with
    english_cleaners_v2)."""
    if gradtts_text_conv:
        return text_to_sequence(text, dictionary=cmudict)
    from arttts_tpu.text.converters import text_to_arpabet

    arp_words = text_to_arpabet(text, dictionary=cmudict)
    return text_to_sequence(
        " ".join(arp_words),
        cleaner_names=("english_cleaners_v2",),
        dictionary=cmudict,
    )


class _Base:
    def __len__(self) -> int:
        return len(self.entries)

    def lengths(self) -> np.ndarray:
        """Approximate output lengths for length-grouped batching; subclasses
        override when cheap exact lengths exist."""
        return np.array([len(e[-1]) for e in self.entries])

    def sample_test_batch(self, size: int, seed: int = 37) -> List[Dict]:
        idx = np.random.default_rng(seed).choice(len(self), size=size, replace=False)
        return [self[int(i)] for i in idx]


class TextArticDataset(_Base):
    """v0: text -> ternary traits + SPARC articulatory features (data.py:35)."""

    def __init__(
        self,
        filelist_path: str,
        cmudict_path: str,
        artic_dir: str,
        add_blank: bool = True,
        merge_diphtongues: bool = True,
        log_normalize_loudness: bool = False,
        shuffle: bool = True,
        seed: int = 37,
    ):
        self.entries = parse_filelist(filelist_path)
        if shuffle:
            np.random.default_rng(seed).shuffle(self.entries)
        self.cmudict = CMUDict(cmudict_path)
        self.artic_dir = Path(artic_dir)
        self.add_blank = add_blank
        self.merge_diphtongues = merge_diphtongues
        self.log_normalize_loudness = log_normalize_loudness

    def get_text(self, text: str) -> np.ndarray:
        ipa = text_to_ipa(text, dictionary=self.cmudict)
        if ipa is None:
            raise ValueError(f"unconvertible text: {text!r}")
        if self.add_blank:
            ipa = intersperse(ipa, " ")
        return ipa_to_ternary(ipa, merge_diphtongues=self.merge_diphtongues)

    def get_art(self, filepath: str) -> np.ndarray:
        stem = Path(filepath).stem
        return load_art_features(
            self.artic_dir / "emasrc" / f"{stem}.npy",
            log_normalize_loudness=self.log_normalize_loudness,
        )

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        filepath, text = self.entries[index][0], self.entries[index][1]
        return {"x": self.get_text(text), "y": self.get_art(filepath)}


class PhnmArticDataset(_Base):
    """v1/v1_1/v5: forced-aligned phnm3 -> traits + art (data_phnm.py:35).

    Filelist rows: [wav_fp, phnm3_fp]; art npys live next to the phnm3 dir
    under encoded_audio_en/emasrc (data_phnm.py:139-151)."""

    def __init__(
        self,
        filelist_path: str,
        data_root_dir: str,
        merge_diphtongues: bool = False,
        log_normalize_loudness: bool = False,
        shuffle: bool = True,
        seed: int = 37,
        artic_subdir: str = "encoded_audio_en",
    ):
        self.entries = parse_filelist(filelist_path)
        if shuffle:
            np.random.default_rng(seed).shuffle(self.entries)
        self.data_root_dir = data_root_dir
        self.merge_diphtongues = merge_diphtongues
        self.log_normalize_loudness = log_normalize_loudness
        self.artic_subdir = artic_subdir

    def get_phnm_emb(self, phnm3_fp: str) -> np.ndarray:
        phnm3 = np.load(_resolve(phnm3_fp, self.data_root_dir))
        word = "%".join(str(e[2]) for e in phnm3)
        return ipa_to_ternary([word], merge_diphtongues=self.merge_diphtongues)

    def get_durations(self, phnm3_fp: str) -> np.ndarray:
        """phnm3 (start, end, phone) seconds -> frame counts at 50 Hz with
        diphthong halving (data_phnmmel.py:132-150)."""
        phnm3 = np.load(_resolve(phnm3_fp, self.data_root_dir))
        durations = []
        for start, end, phone in phnm3:
            start, end = float(start), float(end)
            if not self.merge_diphtongues and str(phone) in DIPHTHONGS_IPA:
                mid = (end + start) / 2
                durations += [mid - start, end - mid]
            else:
                durations.append(end - start)
        return np.asarray(durations, np.float32) * 50.0

    def get_art(self, phnm3_fp: str) -> np.ndarray:
        phnm3_fp = _resolve(phnm3_fp, self.data_root_dir)
        stem = Path(phnm3_fp).stem
        art_name = f"{stem[:-6]}.npy"  # strip "_phnm3"
        art_fp = Path(phnm3_fp).parent.parent / self.artic_subdir / "emasrc" / art_name
        return load_art_features(
            art_fp, log_normalize_loudness=self.log_normalize_loudness
        )

    def lengths(self) -> np.ndarray:
        """Exact 50 Hz frame counts from the phnm3 end times (the filelist's
        last field is a path of near-constant length, so the base heuristic
        would degenerate to arbitrary order)."""
        if getattr(self, "_lengths", None) is None:
            out = []
            for entry in self.entries:
                phnm3 = np.load(_resolve(entry[1], self.data_root_dir))
                out.append(int(round(float(phnm3[-1][1]) * 50.0)))
            self._lengths = np.asarray(out)
        return self._lengths

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        phnm3_fp = self.entries[index][1]
        return {"x": self.get_phnm_emb(phnm3_fp), "y": self.get_art(phnm3_fp)}


class TextMelDataset(_Base):
    """v2: symbol ids + 80-mel (data_textmel.py:34-131)."""

    def __init__(
        self,
        filelist_path: str,
        cmudict_path: str,
        data_root_dir: str,
        add_blank: bool = True,
        mel_config: MelConfig = MelConfig(),
        shuffle: bool = True,
        seed: int = 37,
        mel_cache_dir: Optional[str] = None,
        gradtts_text_conv: bool = True,
    ):
        self.entries = parse_filelist(filelist_path)
        if shuffle:
            np.random.default_rng(seed).shuffle(self.entries)
        self.cmudict = CMUDict(cmudict_path)
        self.data_root_dir = data_root_dir
        self.add_blank = add_blank
        self.gradtts_text_conv = gradtts_text_conv
        self.mel = MelSpectrogram(mel_config)
        self.mel_cache_dir = Path(mel_cache_dir) if mel_cache_dir else None
        if self.mel_cache_dir:
            self.mel_cache_dir.mkdir(parents=True, exist_ok=True)

    def get_text(self, text: str) -> np.ndarray:
        seq = _text_to_symbol_ids(text, self.cmudict, self.gradtts_text_conv)
        if self.add_blank:
            seq = intersperse(seq, len(symbols))
        return np.asarray(seq, np.int32)

    def get_mel(self, filepath: str) -> np.ndarray:
        wav_fp = _resolve(filepath, self.data_root_dir)
        if self.mel_cache_dir:
            cached = self.mel_cache_dir / (Path(wav_fp).stem + ".npy")
            if cached.exists():
                return np.load(cached)
        audio, _ = load_wav(wav_fp, target_sr=self.mel.config.sample_rate)
        mel = np.asarray(self.mel(audio[None, :])[0], np.float32)  # (T, 80)
        if self.mel_cache_dir:
            np.save(cached, mel)
        return mel

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        filepath, text = self.entries[index][0], self.entries[index][1]
        return {"x": self.get_text(text), "y": self.get_mel(filepath)}


class PhnmMelDataset(PhnmArticDataset):
    """v3: phnm3 traits + mel target (data_phnmmel.py:35-208)."""

    def __init__(
        self,
        filelist_path: str,
        data_root_dir: str,
        mel_config: MelConfig = MelConfig(),
        merge_diphtongues: bool = False,
        shuffle: bool = True,
        seed: int = 37,
        mel_cache_dir: Optional[str] = None,
    ):
        super().__init__(
            filelist_path,
            data_root_dir,
            merge_diphtongues=merge_diphtongues,
            shuffle=shuffle,
            seed=seed,
        )
        self.mel_helper = TextMelDataset.__new__(TextMelDataset)
        self.mel_helper.mel = MelSpectrogram(mel_config)
        self.mel_helper.data_root_dir = data_root_dir
        self.mel_helper.mel_cache_dir = Path(mel_cache_dir) if mel_cache_dir else None
        if self.mel_helper.mel_cache_dir:
            self.mel_helper.mel_cache_dir.mkdir(parents=True, exist_ok=True)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        wav_fp, phnm3_fp = self.entries[index][0], self.entries[index][1]
        return {
            "x": self.get_phnm_emb(phnm3_fp),
            "y": self.mel_helper.get_mel(wav_fp),
            "durations": self.get_durations(phnm3_fp),
        }


class TextMelSpeakerDataset(TextMelDataset):
    """Multi-speaker text+mel (LibriTTS-style filelists `wav|text|spk_id`,
    ref data_textmel.py's TextMelSpeaker* collators)."""

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.entries[index]
        filepath, text, spk = row[0], row[1], int(row[2])
        return {
            "x": self.get_text(text),
            "y": self.get_mel(filepath),
            "spk": np.asarray(spk, np.int32),
        }


class TextArtDataset(_Base):
    """v4: GradTTS symbol ids + articulatory target (data_textart.py:38)."""

    def __init__(
        self,
        filelist_path: str,
        cmudict_path: str,
        artic_dir: str,
        add_blank: bool = True,
        log_normalize_loudness: bool = False,
        shuffle: bool = True,
        seed: int = 37,
        gradtts_text_conv: bool = True,
    ):
        self.entries = parse_filelist(filelist_path)
        if shuffle:
            np.random.default_rng(seed).shuffle(self.entries)
        self.cmudict = CMUDict(cmudict_path)
        self.artic_dir = Path(artic_dir)
        self.add_blank = add_blank
        self.gradtts_text_conv = gradtts_text_conv
        self.log_normalize_loudness = log_normalize_loudness

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        filepath, text = self.entries[index][0], self.entries[index][1]
        seq = _text_to_symbol_ids(text, self.cmudict, self.gradtts_text_conv)
        if self.add_blank:
            seq = intersperse(seq, len(symbols))
        art = load_art_features(
            self.artic_dir / "emasrc" / f"{Path(filepath).stem}.npy",
            log_normalize_loudness=self.log_normalize_loudness,
        )
        return {"x": np.asarray(seq, np.int32), "y": art}
