from arttts_tpu.voxcommunis.decoder import FeatureDecoder
from arttts_tpu.voxcommunis.data import (
    FeatureTokenizer,
    PanPhonInventory,
    PhoneticFeatureDataset,
    LANGUAGES,
)
from arttts_tpu.voxcommunis.io import read_alignment, read_manifest, write_manifest

__all__ = [
    "FeatureDecoder",
    "FeatureTokenizer",
    "PanPhonInventory",
    "PhoneticFeatureDataset",
    "LANGUAGES",
    "read_alignment",
    "read_manifest",
    "write_manifest",
]
