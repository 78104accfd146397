"""ctypes binding to the native C++ MIDI tokenizer (native/midi_tokenizer.cc).

Falls back to the pure-Python codec when the shared library hasn't been
built (`make -C native`). Semantics parity is enforced by
tests/test_native_tokenizer.py.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "libmiditok.so"
_lib: Optional[ctypes.CDLL] = None


def _load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", str(_REPO_ROOT / "native")],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.midi_tokenize.restype = ctypes.c_int64
    lib.midi_tokenize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def tokenize_bytes(data: bytes, min_notes: int = 0) -> Optional[np.ndarray]:
    """MIDI file bytes -> int64 token array via the native tokenizer.

    Returns None when the library is unavailable; raises on parse errors;
    returns an empty array when the file has fewer than min_notes notes.
    """
    lib = _load()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    cap = max(64, len(data) * 2)  # tokens <= 5 * notes <= ~bytes
    out = np.empty(cap, dtype=np.int64)
    n = lib.midi_tokenize(
        buf, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap, min_notes,
    )
    if n == -6:  # buffer too small (pathological); retry bigger
        cap = len(data) * 8
        out = np.empty(cap, dtype=np.int64)
        n = lib.midi_tokenize(
            buf, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap, min_notes,
        )
    if n < 0:
        raise ValueError(f"native MIDI tokenizer error {n}")
    return out[:n].copy()


def tokenize_file(path: str, min_notes: int = 0) -> Optional[np.ndarray]:
    with open(path, "rb") as f:
        return tokenize_bytes(f.read(), min_notes)
