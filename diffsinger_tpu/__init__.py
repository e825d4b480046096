"""DiffSinger-TPU: a TPU-native (JAX/XLA/Pallas/pjit) singing-voice & speech synthesis framework.

Re-implements the capabilities of MoonInTheRiver/DiffSinger (FastSpeech2 + shallow
diffusion text/MIDI-to-mel, PLMS sampling, NSF-HiFiGAN vocoding, binarization data
pipeline, training/inference tasks) with a TPU-first design:

- functional Flax modules with [B, T, C] layouts, explicit padding masks and RNG keys
- static shapes (length buckets) so everything jits once
- diffusion reverse loops as single ``lax.scan`` programs (no host round-trips per step)
- ``jax.sharding.Mesh`` + NamedSharding data/tensor parallelism instead of DDP/NCCL
- Pallas kernels for hot ops (gated dilated conv stacks, resblock fusion)
"""

__version__ = "0.1.0"
