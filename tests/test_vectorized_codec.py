"""Device-tier vectorized codec vs the host Python codec."""
import random

import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.midi import MidiNote, encode
from musicgen_tpu.midi.codec import adjust_note_time
from musicgen_tpu.midi.vectorized import (
    GridNotes,
    PAD_TOKEN,
    decode_tokens,
    encode_notes_grid,
)
from tests.test_tokenizer import _random_notes


def _grid_from_notes(notes):
    gnotes = [MidiNote(**vars(n)) for n in notes]
    adjust_note_time(gnotes)
    n = len(gnotes)
    return GridNotes(
        pitch=jnp.asarray([g.pitch for g in gnotes], jnp.int32),
        channel=jnp.asarray([g.channel for g in gnotes], jnp.int32),
        dynamic=jnp.asarray([g.dynamic for g in gnotes], jnp.int32),
        start=jnp.asarray([g.time_start for g in gnotes], jnp.int32),
        end=jnp.asarray([g.time_end for g in gnotes], jnp.int32),
        tempo=jnp.asarray([int(g.tempo) for g in gnotes], jnp.int32),
        valid=jnp.ones((n,), bool),
    )


def test_vectorized_encode_matches_host():
    rng = random.Random(0)
    notes = _random_notes(rng, n=100, n_channels=3)
    host_tokens = encode([MidiNote(**vars(n)) for n in notes])

    grid = _grid_from_notes(notes)
    tokens, count = jax.jit(encode_notes_grid)(grid)
    got = list(np.asarray(tokens)[: int(count)])
    assert got == host_tokens


def test_vectorized_roundtrip():
    rng = random.Random(3)
    notes = _random_notes(rng, n=80, n_channels=2)
    grid = _grid_from_notes(notes)
    tokens, count = encode_notes_grid(grid)

    decoded = jax.jit(decode_tokens)(tokens)
    n = int(jnp.sum(decoded.valid))
    assert n == len(notes)
    np.testing.assert_array_equal(
        np.asarray(decoded.pitch[:n]), np.asarray(grid.pitch)
    )
    np.testing.assert_array_equal(
        np.asarray(decoded.channel[:n]), np.asarray(grid.channel)
    )
    np.testing.assert_array_equal(
        np.asarray(decoded.dynamic[:n]), np.asarray(grid.dynamic)
    )
    np.testing.assert_array_equal(
        np.asarray(decoded.tempo[:n]), np.asarray(grid.tempo)
    )
    # Starts/ends round-trip modulo the time-delta cap (512) which the
    # generator never exceeds here.
    np.testing.assert_array_equal(
        np.asarray(decoded.start[:n]), np.asarray(grid.start)
    )
    # Lengths are capped at 511 by the vocabulary.
    exp_end = np.minimum(
        np.asarray(grid.end) - np.asarray(grid.start), 511
    ) + np.asarray(grid.start)
    np.testing.assert_array_equal(np.asarray(decoded.end[:n]), exp_end)


def test_vectorized_padding():
    grid = GridNotes(
        pitch=jnp.asarray([60, 0], jnp.int32),
        channel=jnp.asarray([0, 0], jnp.int32),
        dynamic=jnp.asarray([64, 0], jnp.int32),
        start=jnp.asarray([0, 0], jnp.int32),
        end=jnp.asarray([4, 0], jnp.int32),
        tempo=jnp.asarray([120, 0], jnp.int32),
        valid=jnp.asarray([True, False]),
    )
    tokens, count = encode_notes_grid(grid)
    assert int(count) == 5  # pitch, dyn, len, dt (first always), tempo
    assert all(t == PAD_TOKEN for t in np.asarray(tokens)[5:])
