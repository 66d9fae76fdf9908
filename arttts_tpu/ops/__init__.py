from arttts_tpu.ops.shape import (
    sequence_mask,
    fix_len_compatibility,
    generate_path,
    duration_loss,
)
from arttts_tpu.ops.mas import maximum_path

__all__ = [
    "sequence_mask",
    "fix_len_compatibility",
    "generate_path",
    "duration_loss",
    "maximum_path",
]
