from arttts_tpu.models.tts import GradTTSModel, build_model

__all__ = ["GradTTSModel", "build_model"]
