from arttts_tpu.audio.mel import MelConfig, MelSpectrogram, mel_filterbank

__all__ = ["MelConfig", "MelSpectrogram", "mel_filterbank"]
