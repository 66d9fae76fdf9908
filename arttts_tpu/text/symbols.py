"""Symbol inventory for the GradTTS text path.

Must match the reference inventory exactly (`src/text/symbols.py:5-16`,
Tacotron lineage) so that embedding tables and checkpoints line up:
pad + special + original punctuation + letters + @ARPAbet, with the model
vocab being `len(symbols) + 1` when interspersed blanks are used
(`arttts_inference.py:57`).
"""

from arttts_tpu.text.cmudict import VALID_ARPABET

PAD = "_"
PUNCTUATION = "!'(),.:;? \"|"  # extended set used by the ternary path
PUNCTUATION_ORI = "!'(),.:;? "  # original Tacotron set used for symbol ids
SPECIAL = "-"
LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

ARPABET = ["@" + s for s in VALID_ARPABET]

symbols = [PAD] + list(SPECIAL) + list(PUNCTUATION_ORI) + list(LETTERS) + ARPABET


def n_symbols_with_blank() -> int:
    """Vocab size including the interspersed blank id (= len(symbols))."""
    return len(symbols) + 1
