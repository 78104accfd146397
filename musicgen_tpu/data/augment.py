"""Data augmentation as pure jnp transforms (device-side, jit-safe).

Mirrors the reference's token-range transforms (reference:
processing/dataset.py:18-39,137-165) but runs inside the jitted train step
under a jax.random key instead of per-item on the host:

  * pitch shift +/-12 preserving instrument channel (div/mod by 128)
  * velocity shift +/-20
  * time / length / tempo multiplication by a shared random factor in
    {0.5, 1.0, ..., 4.0}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import VOCAB, VocabLayout


def shift_range(seq, amount, lower, upper):
    """Add `amount` to tokens in [lower, upper), clamped (dataset.py:18-22)."""
    mask = (seq >= lower) & (seq < upper)
    shifted = jnp.clip(seq + amount, lower, upper - 1)
    return jnp.where(mask, shifted, seq)


def shift_pitch_preserving_channel(seq, amount, layout: VocabLayout = VOCAB):
    """Pitch shift inside the combined pitch+channel field (dataset.py:24-33)."""
    d = layout.disc
    lower = layout.pitch_start
    upper = layout.pitch_start + d.pitch * d.channel - 1
    mask = (seq >= lower) & (seq < upper)
    channel = seq // d.pitch
    pitch = seq % d.pitch
    shifted = channel * d.pitch + jnp.clip(pitch + amount, 0, d.pitch - 1)
    return jnp.where(mask, shifted, seq)


def multiply_range(seq, factor, lower, upper):
    """Multiply (token - lower) by factor, clamped (dataset.py:35-39)."""
    mask = (seq >= lower) & (seq < upper)
    scaled = jnp.clip(
        ((seq - lower).astype(jnp.float32) * factor).astype(seq.dtype) + lower,
        lower,
        upper - 1,
    )
    return jnp.where(mask, scaled, seq)


def augment(seq: jax.Array, rng: jax.Array, layout: VocabLayout = VOCAB) -> jax.Array:
    """Full augmentation pipeline (dataset.py:137-165). seq: (..., T) int32."""
    d = layout.disc
    k_pitch, k_vel, k_time = jax.random.split(rng, 3)

    pitch_shift = jax.random.randint(k_pitch, (), -12, 13)
    seq = shift_pitch_preserving_channel(seq, pitch_shift, layout)

    vel_shift = jax.random.randint(k_vel, (), -20, 21)
    seq = shift_range(
        seq, vel_shift, layout.dyn_start, layout.dyn_start + d.dyn - 1
    )

    factor = jax.random.randint(k_time, (), 1, 9).astype(jnp.float32) / 2.0
    seq = multiply_range(
        seq, factor, layout.time_start, layout.time_start + d.time - 1
    )
    seq = multiply_range(
        seq, factor, layout.length_start, layout.length_start + d.length - 1
    )
    seq = multiply_range(
        seq, factor, layout.tempo_start, layout.tempo_start + d.tempo - 1
    )
    return seq
