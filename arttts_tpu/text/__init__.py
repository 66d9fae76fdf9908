from arttts_tpu.text.symbols import symbols, n_symbols_with_blank
from arttts_tpu.text.sequence import text_to_sequence, sequence_to_text
from arttts_tpu.text.cmudict import CMUDict
from arttts_tpu.text.converters import text_to_ipa, ipa_to_ternary

__all__ = [
    "symbols",
    "n_symbols_with_blank",
    "text_to_sequence",
    "sequence_to_text",
    "CMUDict",
    "text_to_ipa",
    "ipa_to_ternary",
]
