"""Cross-validate the production SMF reader against an independent oracle.

VERDICT round-2 item 10: the 27 reference-shipped .mid files are the only
externally-produced MIDI in this environment, and the golden token fixtures
were pinned with this repo's own codec. tests/smf_oracle.py is a second,
from-spec-only parser (no shared code with musicgen_tpu/midi/smf.py); both
agreeing on every foreign file is the in-environment substitute for the
missing pretty_midi oracle (reference processing/processing.py:57-83 reads
these files through pretty_midi).
"""
import json
import os

import pytest

from smf_oracle import read_notes

REFERENCE_ROOT = "/root/reference"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures_reference_midi.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference repo not present"
)


def _reference_files():
    with open(FIXTURES) as f:
        return sorted(json.load(f))


@pytest.mark.parametrize("rel", _reference_files())
def test_readers_agree_on_foreign_file(rel):
    from musicgen_tpu.midi import smf

    path = os.path.join(REFERENCE_ROOT, rel)
    parsed = smf.load(path)
    oracle_notes, oracle_anchors = read_notes(path)

    # Tempo map: (seconds, bpm) sequences must match.
    times, bpm = parsed.get_tempo_changes()
    assert len(times) == len(oracle_anchors)
    for (sec, b), (_tick, osec, us) in zip(zip(times, bpm), oracle_anchors):
        assert sec == pytest.approx(osec, abs=1e-9), rel
        assert b == pytest.approx(60e6 / us, rel=1e-12), rel

    # Note events: multiset equality on (program, is_drum, pitch, velocity,
    # start_sec, end_sec). Seconds are quantized to ns for hashing; both
    # readers integrate the same float path so they agree far tighter.
    def key(program, is_drum, pitch, velocity, start, end):
        return (program, is_drum, pitch, velocity, round(start * 1e9), round(end * 1e9))

    main_keys = sorted(
        key(inst.program, inst.is_drum, n.pitch, n.velocity, n.start, n.end)
        for inst in parsed.instruments
        for n in inst.notes
    )
    oracle_keys = sorted(
        key(n.program, n.channel == 9, n.pitch, n.velocity, n.start_sec, n.end_sec)
        for n in oracle_notes
    )
    assert len(main_keys) > 0, rel
    assert main_keys == oracle_keys, rel


def test_dense_near_identical_tempo_events_serialize():
    """Generated content (e.g. diffusion canvas decode) emits per-note tempo
    changes at near-identical times — closer than one MIDI tick. The tempo
    map's anchor rounding must never produce a negative delta (round-4
    inpaint crash: _build_write_tempo_map dtick rounding to -1)."""
    from musicgen_tpu.midi import extract_midi, smf
    from musicgen_tpu.midi.smf import Instrument, SmfNote

    inst = Instrument(program=0, is_drum=False)
    inst.notes.append(SmfNote(pitch=60, velocity=80, start=0.0, end=1.0))
    tempos = [(0.0, 120.0)] + [
        (0.001 * i, 100.0 + (i % 7)) for i in range(1, 400)
    ]
    out = "/tmp/test_dense_tempo.mid"
    smf.save(out, [inst], tempos)  # must not raise
    notes = extract_midi(out)
    assert len(notes) == 1
    # Non-positive bpm is clamped, not propagated (negative tick slope).
    smf.save(out, [inst], [(0.0, 0.0), (0.5, -30.0)])
    assert len(extract_midi(out)) == 1
