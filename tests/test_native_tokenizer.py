"""Native C++ tokenizer parity: token-for-token equal to the Python codec
on synthesized multi-channel, multi-tempo MIDI files."""
import random

import numpy as np
import pytest

from musicgen_tpu.midi import MidiNote, decode, encode, extract_midi, note_to_midi
from musicgen_tpu.midi import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native tokenizer not built and no compiler available")


def _make_midi(tmp_path, seed, n=200, n_channels=3, name="t.mid"):
    from tests.test_tokenizer import _random_notes

    rng = random.Random(seed)
    notes = _random_notes(rng, n=n, n_channels=n_channels)
    tokens = encode([MidiNote(**vars(x)) for x in notes])
    path = str(tmp_path / name)
    note_to_midi(decode(tokens), path)
    return path


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_native_matches_python(tmp_path, lib_available, seed):
    path = _make_midi(tmp_path, seed, name=f"m{seed}.mid")
    py_tokens = np.asarray(encode(extract_midi(path)), dtype=np.int64)
    c_tokens = native.tokenize_file(path)
    np.testing.assert_array_equal(c_tokens, py_tokens)


def test_native_min_notes_filter(tmp_path, lib_available):
    path = _make_midi(tmp_path, 2, n=50, n_channels=1, name="small.mid")
    out = native.tokenize_file(path, min_notes=200)
    assert out is not None and out.size == 0


def test_native_rejects_garbage(lib_available):
    with pytest.raises(ValueError):
        native.tokenize_bytes(b"not a midi file at all........")
