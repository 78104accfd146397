"""Golden token-stream fixtures for the reference repo's shipped MIDI files.

The 27 `.mid` artifacts under /root/reference/{scripts/midi,samples} are
EXTERNALLY produced (written by pretty_midi on the author's cluster —
reference processing/processing.py:85-109) — unlike the round-1 round-trip
tests, which only read files written by this repo's own SMF writer. Pinning
their token streams gives the SMF reader coverage of foreign encoder output
(running status, pretty_midi tempo-track layout) and freezes codec behavior
against regressions.

The pinned streams were produced by this repo's codec (pretty_midi is not
installed in this environment, so the reference tokenizer itself cannot be
run as an oracle here); what the fixtures assert is (a) stability, (b)
Python == C++ tokenizer equality on real foreign files, (c) decode ->
SMF write -> re-encode fixpoint on already-grid-quantized streams.
"""
import hashlib
import json
import os

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures_reference_midi.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference repo not present"
)


def _fixtures():
    with open(FIXTURES) as f:
        return json.load(f)


def _sha(tokens) -> str:
    return hashlib.sha256(np.asarray(tokens, np.int64).tobytes()).hexdigest()


def test_all_reference_midi_match_pinned_streams():
    from musicgen_tpu.midi.codec import encode_file

    fixtures = _fixtures()
    assert len(fixtures) == 27
    for rel, pin in fixtures.items():
        path = os.path.join(REFERENCE_ROOT, rel)
        toks = encode_file(path)
        assert len(toks) == pin["n"], rel
        assert [int(t) for t in toks[:16]] == pin["head"], rel
        assert [int(t) for t in toks[-8:]] == pin["tail"], rel
        assert _sha(toks) == pin["sha256"], rel


def test_native_tokenizer_matches_pinned_streams():
    from musicgen_tpu.midi import native

    if not native.available():
        pytest.skip("native tokenizer not built and no compiler available")
    fixtures = _fixtures()
    for rel, pin in list(fixtures.items()):
        path = os.path.join(REFERENCE_ROOT, rel)
        toks = native.tokenize_file(path)
        assert toks is not None, rel
        assert len(toks) == pin["n"], rel
        assert _sha(toks) == pin["sha256"], rel


def test_decode_reencode_fixpoint(tmp_path):
    """encode(write(decode(t))) == t: a stream already on the beat grid must
    survive a decode -> SMF write -> re-extract cycle token-for-token.

    Two documented exceptions, inherent to the REFERENCE codec's semantics
    (not writer bugs): (a) notes identical modulo tempo dedup away on
    re-extract (MIDI_note.__eq__ ignores tempo, reference note.py:14-20), so
    the stream may shrink once; (b) a note whose duration spans a tempo
    change gets its seconds reconstructed from its start tempo alone
    (reference processing.py:154-169) while re-extraction converts through
    the true tempo map, so its LENGTH token may drift. The test therefore
    allows only: one-time shrink-to-fixpoint, or <1% of positions differing
    and every differing position being a length-field token.
    """
    from musicgen_tpu.midi import decode, note_to_midi
    from musicgen_tpu.midi.codec import encode_file

    fixtures = _fixtures()
    # Exhaustive over the scripts/midi set; a sample of the larger tree.
    chosen = [r for r in fixtures if r.startswith("scripts/midi/")]
    chosen += [r for r in sorted(fixtures) if not r.startswith("scripts/midi/")][:5]
    from musicgen_tpu.config import VOCAB

    for i, rel in enumerate(chosen):
        toks = np.asarray(
            encode_file(os.path.join(REFERENCE_ROOT, rel)), np.int64
        )
        for it in range(2):
            out = str(tmp_path / f"fix{i}_{it}.mid")
            note_to_midi(decode([int(t) for t in toks]), out)
            again = np.asarray(encode_file(out), np.int64)
            if np.array_equal(toks, again):
                break
            toks = again
        else:
            # No exact fixpoint after a dedup pass: residual drift must be
            # rare and confined to length tokens (tempo-spanning notes).
            out = str(tmp_path / f"fix{i}_final.mid")
            note_to_midi(decode([int(t) for t in toks]), out)
            again = np.asarray(encode_file(out), np.int64)
            assert len(again) == len(toks), rel
            diff = np.nonzero(toks != again)[0]
            assert len(diff) <= max(1, len(toks) // 100), rel
            in_length = (toks[diff] >= VOCAB.length_start) & (
                toks[diff] < VOCAB.time_start
            )
            in_length_new = (again[diff] >= VOCAB.length_start) & (
                again[diff] < VOCAB.time_start
            )
            assert np.all(in_length) and np.all(in_length_new), rel
