"""Corpus preprocessing: walk a MIDI tree, tokenize, save .npy streams.

Mirrors the reference preprocessor (reference: processing/processing.py:24-55):
mirrors the <model>/<band>/<song> directory layout, skips files that already
exist or have numeric suffixes, drops pieces with fewer than 200 notes, and
swallows per-file codec errors (logged here instead of silently dropped).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Iterable, List

import numpy as np

from ..midi import codec


def find_files_by_extensions(root: str, exts: Iterable[str]) -> List[str]:
    out = []
    for path, _, files in os.walk(root):
        for name in files:
            if any(name.lower().endswith(e) for e in exts):
                out.append(os.path.join(path, name))
    return sorted(out)


def preprocess_midi_files(
    midi_folder: str,
    preprocess_folder: str,
    min_notes: int = 200,
    verbose: bool = True,
    use_native: bool = True,
) -> int:
    """Returns the number of files successfully tokenized.

    Uses the C++ tokenizer (native/midi_tokenizer.cc, ~30x the Python codec)
    when built; parity is test-enforced, and the Python path is the fallback.
    """
    from ..midi import native

    native_ok = use_native and native.available()
    midi_paths = find_files_by_extensions(midi_folder, [".mid", ".midi"])
    os.makedirs(preprocess_folder, exist_ok=True)
    count = 0
    for path in midi_paths:
        parts = Path(path).parts
        model_name = parts[-3] if len(parts) >= 3 else "data"
        band_name = parts[-2] if len(parts) >= 2 else "unknown"
        song_name = Path(path).stem

        out_dir = os.path.join(preprocess_folder, model_name, band_name)
        os.makedirs(out_dir, exist_ok=True)
        new_path = os.path.join(out_dir, song_name)

        if os.path.exists(new_path + ".npy"):
            continue
        if re.search(r"\.\d+$", new_path):
            continue
        try:
            if native_ok:
                tokens = native.tokenize_file(path, min_notes=min_notes)
                if tokens is None or tokens.size == 0:
                    continue
            else:
                notes = codec.extract_midi(path)
                if len(notes) < min_notes:
                    continue
                tokens = np.asarray(codec.encode(notes), dtype=np.int64)
            np.save(new_path + ".npy", tokens)
            count += 1
        except Exception as e:  # noqa: BLE001 — reference swallows silently
            if verbose:
                print(f"[preprocess] skipping {path}: {type(e).__name__}: {e}")
            continue
    return count


def remove_short_npy_files(root: str, min_length: int = 1030, dry_run: bool = False) -> int:
    """Delete token files shorter than min_length (reference:
    scripts/fix_dataset.ipynb `remove_short_npy_files`). Returns count."""
    removed = 0
    for path in find_files_by_extensions(root, [".npy"]):
        try:
            n = np.load(path, mmap_mode="r").shape[0]
        except Exception:
            continue
        if n < min_length:
            if not dry_run:
                os.remove(path)
            removed += 1
    return removed
