from .events import MidiNote
from .codec import (
    adjust_note_time,
    decode,
    encode,
    encode_file,
    extract_midi,
    note_to_midi,
    revert_note_time,
)
from . import smf

__all__ = [
    "MidiNote",
    "adjust_note_time",
    "decode",
    "encode",
    "encode_file",
    "extract_midi",
    "note_to_midi",
    "revert_note_time",
    "smf",
]
