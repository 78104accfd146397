"""musicgen_tpu — TPU-native (JAX/XLA/Pallas) symbolic-music sequence-modeling
framework with the capabilities of
thorGabe123/Deep-Learning-Based-Sequence-Models-for-Music-Generation.

Subpackages:
  config    — frozen dataclass config tree + vocabulary layout
  midi      — MIDI file I/O (from-scratch SMF codec) + event tokenizer
  data      — .npy corpus pipeline, metadata tokenization, augmentation
  ops       — Pallas kernels + pure-XLA reference implementations
  models    — TransformerLM / MambaLM / XLSTMLM / XLSTMClassifier (flax)
  train     — jitted training steps, optax/orbax, JSON step logs
  sample    — state-cached lax.scan sampler (grammar + repetition penalties)
  parallel  — device mesh + sharding helpers (DP/TP over ICI)
  eval      — accuracy / classifier-success / timing harnesses
  diffusion — guided-diffusion UNet + RePaint inpainting (bf16)
"""

__version__ = "0.1.0"

from . import config

__all__ = ["config"]
