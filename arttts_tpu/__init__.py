"""arttts-tpu: a TPU-native (JAX/XLA/Pallas) articulatory & mel TTS framework.

Re-implements the capabilities of the `art-tts` reference stack (Grad-TTS-style
diffusion TTS for mel spectrograms and SPARC articulatory trajectories, HiFi-GAN
vocoders, VoxCommunis multilingual variant, UTMOS MOS scoring) with a TPU-first
architecture: functional flax modules, static-shape bucketed batching, Pallas
kernels for Monotonic Alignment Search, and `shard_map` data parallelism over a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
