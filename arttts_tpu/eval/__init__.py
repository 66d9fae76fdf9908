from arttts_tpu.eval.metrics import (
    dtw_path,
    normalized_dtw_score,
    pearson_correlation,
    mel_l2,
)

__all__ = ["dtw_path", "normalized_dtw_score", "pearson_correlation", "mel_l2"]
