"""Corpus preprocessing CLI (reference processing.preprocess_midi_files).

  python -m musicgen_tpu.cli.preprocess --midi data/midi --out data/np
"""
from __future__ import annotations

import argparse

from ..data.preprocess import preprocess_midi_files


def main() -> None:
    p = argparse.ArgumentParser(description="Tokenize a MIDI corpus to .npy")
    p.add_argument("--midi", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-notes", type=int, default=200)
    args = p.parse_args()
    n = preprocess_midi_files(args.midi, args.out, args.min_notes)
    print(f"tokenized {n} files")


if __name__ == "__main__":
    main()
