from arttts_tpu.core.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
    get_preset,
    PRESETS,
)

__all__ = [
    "DataConfig",
    "DecoderConfig",
    "EncoderConfig",
    "ModelConfig",
    "TrainConfig",
    "ExperimentConfig",
    "get_preset",
    "PRESETS",
]
