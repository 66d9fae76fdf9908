"""Canonical segment <-> feature bijection for multilingual tokenization.

Equivalent of `/root/reference/src/voxcommunis/decoder.py:13-223`, built on
the native IPA trait table (`arttts_tpu/text/ipa_features.py`) instead of
panphon. Segments sharing a feature vector collapse onto one representative;
diphthongs either sum (agreement mask, zeros elsewhere) or split into their
component segments. `find_segment` inverts a feature vector with the
least-zeros tie-break and allocates fake segment names for unseen vectors.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, List, Optional, Set, Tuple

import numpy as np

from arttts_tpu.text.ipa_features import SEGMENTS, TRAITS, word_features

PHON_FEAT_DIM = 24

SILENCE = "SIL"
ZERO_TONE = "˧"  # level-tone mark: the all-zero feature vector


def _segment_feature_rows(seg: str) -> List[Tuple[int, ...]]:
    """Per-component feature tuples for a (possibly multi-segment) string;
    unknown segments map to one zero row (like the reference's silence
    fallback, decoder.py:34-40)."""
    if seg == ZERO_TONE:
        return [(0,) * PHON_FEAT_DIM]
    feats = word_features(seg)
    if feats is None:
        return [(0,) * PHON_FEAT_DIM]
    return [tuple(int(v) for v in row) for row in feats]


class UniqueSegmentFeature:
    """Language-restricted inventory (decoder.py:13-77)."""

    def __init__(self, segments: Iterable[str], sum_diphthong: bool):
        self.sum_diphthong = sum_diphthong
        self.features_to_segment: Dict[Tuple[int, ...], Tuple[str, Set[str]]] = {}
        self.unique_segments: Set[str] = set()
        self.multithongs: Set[str] = set()

        mono, multi = [], []
        for seg in segments:
            rows = _segment_feature_rows(seg)
            (mono if len(rows) == 1 else multi).append((seg, rows))
        for batch in (mono, multi):
            for segment, rows in batch:
                self._add_batch_entry(segment, rows)

    def _add_batch_entry(self, segment: str, rows):
        if len(rows) == 1:
            self.add_segment_feature(segment, rows[0])
        elif self.sum_diphthong:
            merged = tuple(
                fs[0] if len(set(fs)) == 1 else 0 for fs in zip(*rows)
            )
            self.add_segment_feature(segment, merged)
        else:
            assert len(segment) == len(rows), (
                f"Expected {len(rows)} components for {segment!r}"
            )
            self.multithongs.add(segment)
            for s, feats in zip(segment, rows):
                self.add_segment_feature(s, feats)

    def add_segment_feature(self, segment: str, features: Tuple[int, ...]):
        if segment not in self.unique_segments:
            self.unique_segments.add(segment)
            if features in self.features_to_segment:
                self.features_to_segment[features][1].add(segment)
            else:
                self.features_to_segment[features] = (segment, {segment})


class UniversalUniqueSegmentFeature:
    """Whole-table inventory for multilingual mode (decoder.py:80-98)."""

    def __init__(self, sum_diphthong: bool):
        self.sum_diphthong = sum_diphthong
        self.features_to_segment: Dict[Tuple[int, ...], Tuple[str, Set[str]]] = {}
        self.unique_segments: Set[str] = set()
        self.multithongs: Set[str] = set()
        for segment in list(SEGMENTS) + [ZERO_TONE]:
            rows = _segment_feature_rows(segment)
            self.add_segment_feature(segment, rows[0])

    def add_segment_feature(self, segment: str, features: Tuple[int, ...]):
        if segment not in self.unique_segments:
            self.unique_segments.add(segment)
            if features in self.features_to_segment:
                self.features_to_segment[features][1].add(segment)
            else:
                self.features_to_segment[features] = (segment, {segment})


class FeatureDecoder:
    def __init__(
        self, sum_diphthong: bool, lang_segments: Optional[Iterable[str]] = None
    ):
        self.fake_segments: Dict[Tuple[int, ...], str] = {}
        self._segment_to_representative: Dict[str, Tuple[str, ...]] = {}

        self.multilingual_mode = lang_segments is None
        if self.multilingual_mode:
            self.unique_seg_feats = UniversalUniqueSegmentFeature(sum_diphthong)
        else:
            self.unique_seg_feats = UniqueSegmentFeature(lang_segments, sum_diphthong)

        self._features = np.asarray(
            list(self.unique_seg_feats.features_to_segment.keys())
        )
        self._representative_to_feature = dict(zip(self.segments, self._features))

        for rep, eq_segments in self.unique_seg_feats.features_to_segment.values():
            for seg in eq_segments:
                self._segment_to_representative[seg] = (rep,)
        for seg in self.unique_seg_feats.multithongs:
            self._segment_to_representative[seg] = tuple(
                rep for s in seg for rep in self._segment_to_representative[s]
            )

        featsT = self._features.T
        self.feature_to_indices = [
            {-1: featsT[d] <= 0, 1: featsT[d] >= 0} for d in range(featsT.shape[0])
        ]

    @functools.cached_property
    def header(self) -> Tuple[str, ...]:
        return tuple(TRAITS[:PHON_FEAT_DIM])

    @functools.cached_property
    def segments(self) -> Tuple[str, ...]:
        return tuple(
            rep for rep, _ in self.unique_seg_feats.features_to_segment.values()
        )

    @functools.lru_cache(maxsize=None)
    def segment_id(self, segment: str) -> int:
        return self.segments.index(segment)

    @property
    def features(self) -> np.ndarray:
        return self._features

    @functools.cached_property
    def zero_index(self) -> int:
        if self.multilingual_mode:
            for k, (_, segs) in enumerate(
                self.unique_seg_feats.features_to_segment.values()
            ):
                if ZERO_TONE in segs:
                    return k
            raise ValueError("no zero-tone entry in multilingual inventory")
        return self.segments.index(SILENCE)

    def segment_to_representative(self, segment: str) -> Tuple[str, ...]:
        if segment == SILENCE:
            return (self.segments[self.zero_index],)
        if segment in self._segment_to_representative:
            return self._segment_to_representative[segment]
        assert self.multilingual_mode, (
            f"Unable to find segment {segment!r} in the language inventory."
        )
        rows = _segment_feature_rows(segment)
        return tuple(
            self.unique_seg_feats.features_to_segment[tuple(r)][0]
            if tuple(r) in self.unique_seg_feats.features_to_segment
            else self.segments[self.zero_index]
            for r in rows
        )

    def canonical_representation(
        self, representative: Tuple[str, ...]
    ) -> Tuple[Tuple[str, ...], np.ndarray]:
        features = [self._representative_to_feature[rep] for rep in representative]
        if self.unique_seg_feats.sum_diphthong and len(representative) > 1:
            assert self.multilingual_mode
            representative = ("".join(representative),)
            features = [
                np.asarray(
                    [fs[0] if len(set(fs)) == 1 else 0 for fs in zip(*features)]
                )
            ]
        return representative, np.stack(features, axis=0)

    def find_segment(self, features: Tuple[int, ...]) -> str:
        if features in self.fake_segments:
            return self.fake_segments[features]
        if not any(features):
            indices = [self.zero_index]
        else:
            masks = [
                f2i[f]
                for f2i, f in zip(self.feature_to_indices, features)
                if f != 0
            ]
            indices = np.flatnonzero(np.logical_and.reduce(masks))
        if len(indices) == 1:
            return self.segments[indices[0]]
        if len(indices) > 1:
            indices = sorted(
                indices.tolist() if hasattr(indices, "tolist") else indices,
                key=lambda idx: np.sum(self.features[idx] == 0),
            )
            return self.segments[indices[0]]
        return self.fake_segments.setdefault(features, str(len(self.fake_segments) + 1))
