from arttts_tpu.audio.mel import MelConfig, MelSpectrogram, mel_filterbank
from arttts_tpu.audio.pitch import PitchConfig, frame_loudness, track_pitch

__all__ = [
    "MelConfig",
    "MelSpectrogram",
    "mel_filterbank",
    "PitchConfig",
    "frame_loudness",
    "track_pitch",
]
