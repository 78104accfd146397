"""Vectorized, jit-compatible token codec over int32 arrays (device tier).

The reference tokenizer is a per-note Python loop (processing.py:129-214).
For batch evaluation / analysis pipelines we also provide pure-jnp
encode/decode over integer arrays so token streams can be packed/unpacked on
device without host round-trips:

  encode_notes_grid: grid-quantized note fields -> token stream
                     (delta-time run-length encoded, fixed-size padded)
  decode_tokens:     token stream -> per-note field arrays (a note closes at
                     each tempo token, per the field grammar)

Seconds<->grid conversion stays on host in float64
(musicgen_tpu.midi.codec), exactly like the reference's stateful tempo math.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import VOCAB, VocabLayout

PAD_TOKEN = -1


class GridNotes(NamedTuple):
    """Grid-quantized note fields, padded with `valid` mask."""

    pitch: jax.Array  # (N,) int32 0..127
    channel: jax.Array  # (N,) int32 0..128
    dynamic: jax.Array  # (N,) int32
    start: jax.Array  # (N,) int32 beat-grid units (absolute)
    end: jax.Array  # (N,) int32
    tempo: jax.Array  # (N,) int32
    valid: jax.Array  # (N,) bool


def encode_notes_grid(
    notes: GridNotes, layout: VocabLayout = VOCAB
) -> Tuple[jax.Array, jax.Array]:
    """Notes -> (tokens (5N,), count). Tokens beyond `count` are PAD_TOKEN.

    Mirrors reference encode (processing.py:129-152): per note
    [pitch+128*ch, dyn, length, (dtime if changed), tempo]; the first note's
    delta-time token is always emitted.
    """
    d = layout.disc
    n = notes.pitch.shape[0]

    pitch_tok = layout.pitch_start + jnp.minimum(
        notes.pitch + notes.channel * d.pitch, d.pitch * d.channel - 1
    )
    dyn_tok = layout.dyn_start + jnp.minimum(notes.dynamic, d.dyn - 1)
    length_tok = layout.length_start + jnp.minimum(
        notes.end - notes.start, d.length - 1
    )
    prev_start = jnp.concatenate([jnp.zeros((1,), notes.start.dtype), notes.start[:-1]])
    dt_tok = layout.time_start + jnp.minimum(notes.start - prev_start, d.time - 1)
    tempo_tok = layout.tempo_start + jnp.minimum(notes.tempo, d.tempo - 1)

    prev_dt = jnp.concatenate([jnp.full((1,), -1, dt_tok.dtype), dt_tok[:-1]])
    emit_dt = (dt_tok != prev_dt) & notes.valid

    # Lay out 5 slots per note, mask unused dt slots, then compact.
    slots = jnp.stack([pitch_tok, dyn_tok, length_tok, dt_tok, tempo_tok], axis=1)
    slot_valid = jnp.stack(
        [notes.valid, notes.valid, notes.valid, emit_dt, notes.valid], axis=1
    )
    flat = slots.reshape(-1)
    flat_valid = slot_valid.reshape(-1)

    count = jnp.sum(flat_valid)
    # Stable compaction: scatter each valid slot to its output position;
    # invalid slots target an out-of-bounds index and are dropped.
    pos = jnp.cumsum(flat_valid) - 1
    idx = jnp.where(flat_valid, pos, 5 * n)
    out = jnp.full((5 * n,), PAD_TOKEN, jnp.int32)
    out = out.at[idx].set(flat.astype(jnp.int32), mode="drop")
    return out, count


def decode_tokens(
    tokens: jax.Array, layout: VocabLayout = VOCAB
) -> GridNotes:
    """Token stream (padded with PAD_TOKEN or any negative) -> GridNotes.

    A note is emitted at each tempo token; its other fields are the most
    recent values seen (delta-time persists across notes, reference
    processing.py:171-214).
    """
    d = layout.disc
    t = tokens.shape[0]
    valid = tokens >= 0
    tok = jnp.where(valid, tokens, 0)

    is_pitch = valid & (tok < layout.dyn_start)
    is_dyn = valid & (tok >= layout.dyn_start) & (tok < layout.length_start)
    is_len = valid & (tok >= layout.length_start) & (tok < layout.time_start)
    is_time = valid & (tok >= layout.time_start) & (tok < layout.tempo_start)
    is_tempo = valid & (tok >= layout.tempo_start)

    def latest(value, present, init):
        """Most recent `value` at or before each position (inclusive scan)."""
        def step(carry, x):
            v, p = x
            new = jnp.where(p, v, carry)
            return new, new
        _, out = jax.lax.scan(step, jnp.asarray(init, value.dtype), (value, present))
        return out

    pitch_val = latest(jnp.mod(tok, d.pitch), is_pitch, 0)
    chan_val = latest(tok // d.pitch, is_pitch, 0)
    dyn_val = latest(tok - layout.dyn_start, is_dyn, 0)
    len_val = latest(tok - layout.length_start, is_len, 0)
    dt_val = latest(tok - layout.time_start, is_time, 0)
    tempo_val = jnp.where(is_tempo, tok - layout.tempo_start, 0)

    # Note boundaries at tempo tokens; start = cumulative sum of the dt in
    # effect at each boundary.
    note_dt = jnp.where(is_tempo, dt_val, 0)
    start_at = jnp.cumsum(note_dt)

    # Compact boundary positions to the front.
    n_notes = jnp.sum(is_tempo)
    order = jnp.argsort(~is_tempo, stable=True)  # tempo positions first
    gather = lambda x: x[order]
    return GridNotes(
        pitch=gather(pitch_val).astype(jnp.int32),
        channel=gather(chan_val).astype(jnp.int32),
        dynamic=gather(dyn_val).astype(jnp.int32),
        start=gather(start_at).astype(jnp.int32),
        end=gather(start_at + len_val).astype(jnp.int32),
        tempo=gather(tempo_val).astype(jnp.int32),
        valid=jnp.arange(t) < n_notes,
    )
