"""Tokenizer fidelity tests: vocabulary layout, encode/decode inverses, and
bit-exact token round-trips through real MIDI files on disk.

The reference has no automated tests (SURVEY.md §4); these encode the
semantics of reference processing/processing.py:57-225 as golden behavior.
"""
import math
import random

import numpy as np
import pytest

from musicgen_tpu.config import VOCAB, Discretization
from musicgen_tpu.midi import (
    MidiNote,
    decode,
    encode,
    extract_midi,
    note_to_midi,
)
from musicgen_tpu.midi import smf


def test_vocab_layout():
    assert VOCAB.vocab_size == 17914
    assert VOCAB.start_idx == {
        "pitch": 0,
        "dyn": 16512,
        "length": 16640,
        "time": 17152,
        "tempo": 17664,
    }
    assert VOCAB.field_boundaries == (16511, 16639, 17151, 17663)
    assert VOCAB.padded_vocab_size() == 17920


def _random_notes(rng, n=120, n_channels=3, tempo_changes=True):
    """Grid-aligned notes in seconds, mimicking real extracted music."""
    notes = []
    tempo = 120
    beat = 0
    res = 60.0 / tempo / 64
    time_cursor = 0.0
    for i in range(n):
        if tempo_changes and i % 37 == 36:
            tempo = rng.choice([90, 120, 150, 200])
        res = 60.0 / tempo / 64
        gap_units = rng.choice([0, 0, 1, 2, 4, 8, 16, 32])
        length_units = rng.choice([4, 8, 16, 32, 64, 128])
        time_cursor += gap_units * res
        notes.append(
            MidiNote(
                pitch=rng.randint(21, 108),
                time_start=time_cursor,
                time_end=time_cursor + length_units * res,
                dynamic=rng.randint(1, 127),
                channel=rng.randrange(n_channels),
                tempo=tempo,
            )
        )
    return notes


def test_encode_decode_token_roundtrip():
    """decode(encode(notes)) re-encodes to the identical token stream."""
    rng = random.Random(0)
    notes = _random_notes(rng)
    tokens = encode([MidiNote(**vars(n)) for n in notes])
    assert len(tokens) > 4 * len(notes)
    assert all(0 <= t < VOCAB.vocab_size for t in tokens)

    decoded = decode(tokens)
    tokens2 = encode(decoded)
    assert tokens == tokens2


def test_decode_field_dispatch():
    """A single 5-token group produces exactly one note with correct fields."""
    d = Discretization()
    pitch, channel, dyn, length, dt, tempo = 60, 2, 90, 32, 16, 120
    tokens = [
        VOCAB.pitch_start + pitch + channel * d.pitch,
        VOCAB.dyn_start + dyn,
        VOCAB.length_start + length,
        VOCAB.time_start + dt,
        VOCAB.tempo_start + tempo,
    ]
    notes = decode(tokens)
    assert len(notes) == 1
    n = notes[0]
    assert n.pitch == pitch and n.channel == channel and n.dynamic == dyn
    assert n.tempo == tempo
    res = 60.0 / tempo / 64
    assert math.isclose(n.time_start, dt * res)
    assert math.isclose(n.time_end, (dt + length) * res)


def test_delta_time_run_length():
    """The delta-time token is only emitted when it changes (reference
    processing.py:145-146), and an initial delta of 0 is never emitted."""
    tempo = 120
    res = 60.0 / tempo / 64
    notes = [
        MidiNote(pitch=60, time_start=0.0, time_end=8 * res, dynamic=64, channel=0, tempo=tempo),
        MidiNote(pitch=62, time_start=0.0, time_end=8 * res, dynamic=64, channel=0, tempo=tempo),
        MidiNote(pitch=64, time_start=4 * res, time_end=12 * res, dynamic=64, channel=0, tempo=tempo),
        MidiNote(pitch=65, time_start=8 * res, time_end=16 * res, dynamic=64, channel=0, tempo=tempo),
    ]
    tokens = encode(notes)
    time_tokens = [t for t in tokens if VOCAB.time_start <= t < VOCAB.tempo_start]
    # note0: first delta token is always emitted (time_delta_prev starts at a
    # raw 0, below the time-token range — reference train of processing.py:134);
    # note1: dt=0 == prev -> not emitted; note2: dt=4 -> emitted;
    # note3: dt=4 == prev -> not emitted.
    assert time_tokens == [VOCAB.time_start, VOCAB.time_start + 4]
    # Groups: 5 + 4 + 5 + 4 tokens
    assert len(tokens) == 18


def _roundtrip(tokens, path):
    """tokens -> decode -> MIDI file -> extract -> encode."""
    note_to_midi(decode(tokens), path)
    return encode(extract_midi(path))


def test_midi_file_roundtrip_bit_exact(tmp_path):
    """Token streams round-trip bit-exact through a real MIDI file.

    Equal-onset notes have no canonical order inside an SMF, so the first
    pass canonicalizes ordering; after that the round-trip must be an exact
    fixpoint.
    """
    rng = random.Random(1)
    for trial in range(5):
        notes = _random_notes(rng, n=150, n_channels=4)
        tokens = encode([MidiNote(**vars(n)) for n in notes])
        # First pass canonicalizes ordering AND resolves overlapping
        # same-pitch/channel notes (inherent SMF note-off ambiguity, same as
        # pretty_midi in the reference).
        canonical = _roundtrip(tokens, str(tmp_path / f"c_{trial}.mid"))
        again = _roundtrip(canonical, str(tmp_path / f"rt_{trial}.mid"))
        assert again == canonical, f"trial {trial}: round-trip not a fixpoint"
        third = _roundtrip(again, str(tmp_path / f"rt2_{trial}.mid"))
        assert third == canonical


def test_midi_file_roundtrip_single_channel_exact(tmp_path):
    """Monophonic (non-overlapping) notes round-trip exactly on the FIRST
    pass — no SMF note-off ambiguity to canonicalize."""
    rng = random.Random(11)
    tempo = 120
    res = 60.0 / tempo / 64
    t, notes = 0.0, []
    for _ in range(200):
        t += rng.choice([1, 2, 4, 8, 16]) * res
        length = rng.choice([4, 8, 32]) * res
        notes.append(MidiNote(pitch=rng.randint(21, 108), time_start=t,
                              time_end=t + length,
                              dynamic=rng.randint(1, 127), channel=0, tempo=tempo))
        t += length
    tokens = encode([MidiNote(**vars(n)) for n in notes])
    assert _roundtrip(tokens, str(tmp_path / "sc.mid")) == tokens


def test_midi_file_roundtrip_with_tempo_changes(tmp_path):
    rng = random.Random(7)
    notes = _random_notes(rng, n=300, n_channels=2, tempo_changes=True)
    tokens = encode([MidiNote(**vars(n)) for n in notes])
    canonical = _roundtrip(tokens, str(tmp_path / "tc.mid"))
    again = _roundtrip(canonical, str(tmp_path / "tempo.mid"))
    assert again == canonical


def test_smf_reader_writer_self_consistent(tmp_path):
    """Low-level SMF: notes written are read back with equal pitch/velocity
    and second-level times within half a tick."""
    inst = smf.Instrument(program=5, is_drum=False)
    rng = random.Random(3)
    t = 0.0
    for _ in range(50):
        t += rng.random() * 0.3
        inst.notes.append(
            smf.SmfNote(pitch=rng.randint(30, 100), velocity=rng.randint(1, 127),
                        start=t, end=t + 0.1 + rng.random()))
    path = str(tmp_path / "x.mid")
    smf.save(path, [inst], [(0.0, 120.0)])
    parsed = smf.load(path)
    assert len(parsed.instruments) == 1
    got = parsed.instruments[0]
    assert got.program == 5
    assert len(got.notes) == 50
    tick_sec = 60.0 / (120.0 * smf.DEFAULT_PPQ)
    for a, b in zip(sorted(inst.notes, key=lambda n: (n.start, n.pitch)), got.notes):
        assert a.pitch == b.pitch and a.velocity == b.velocity
        assert abs(a.start - b.start) <= tick_sec
        assert abs(a.end - b.end) <= tick_sec


def test_drum_channel_roundtrip(tmp_path):
    """Channel >= 128 maps to a drum instrument; drums are dropped on
    re-extraction (reference processing.py:66-69)."""
    tempo = 120
    res = 60.0 / tempo / 64
    notes = [
        MidiNote(pitch=36, time_start=0.0, time_end=8 * res, dynamic=100, channel=128, tempo=tempo),
        MidiNote(pitch=60, time_start=0.0, time_end=8 * res, dynamic=100, channel=0, tempo=tempo),
    ]
    path = str(tmp_path / "drum.mid")
    note_to_midi(notes, path)
    extracted = extract_midi(path)
    assert len(extracted) == 1  # drum note dropped
    assert extracted[0].pitch == 60


def test_encode_caps_out_of_range_fields():
    tempo = 120
    res = 60.0 / tempo / 64
    notes = [
        MidiNote(pitch=127, time_start=0.0, time_end=4000 * res, dynamic=300,
                 channel=200, tempo=9999),
    ]
    tokens = encode(notes)
    # pitch+channel capped to last pitch token, dyn capped to 127-index,
    # length capped to 511, tempo capped to 249; tokens[3] is the always-
    # emitted first delta-time token (dt=0).
    assert tokens[0] == VOCAB.dyn_start - 1
    assert tokens[1] == VOCAB.length_start - 1
    assert tokens[2] == VOCAB.time_start - 1
    assert tokens[3] == VOCAB.time_start
    assert tokens[4] == VOCAB.vocab_size - 1


def test_zero_tempo_token_roundtrip(tmp_path):
    """Regression: a sampled tempo of 0 bpm (vocab id tempo_start) must not
    produce infinite times or overflow the 3-byte MIDI tempo field
    (found driving the generate CLI with an untrained model)."""
    d = Discretization()
    tokens = [
        60, VOCAB.dyn_start + 90, VOCAB.length_start + 8,
        VOCAB.time_start + 4, VOCAB.tempo_start,  # tempo == 0 bpm
        62, VOCAB.dyn_start + 80, VOCAB.length_start + 8,
        VOCAB.tempo_start + 120,
    ]
    notes = decode(tokens)
    assert all(math.isfinite(n.time_start) and math.isfinite(n.time_end) for n in notes)
    path = str(tmp_path / "zero_tempo.mid")
    note_to_midi(notes, path)  # must not raise
    assert extract_midi(path)
