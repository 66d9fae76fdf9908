"""EMA corpus adapters: label->IPA phnm3 converters and EMA binary readers
for MNGU0, MOCHA-TIMIT, MSPKA, and PB2007 (ref `src/utils_dataset/`)."""

from arttts_tpu.corpora.registry import CORPORA, get_corpus

__all__ = ["CORPORA", "get_corpus"]
