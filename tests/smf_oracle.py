"""Independent Standard-MIDI-File reader used ONLY as a test oracle.

Written from the SMF 1.0 specification alone — deliberately sharing no code
or structure with musicgen_tpu/midi/smf.py (different cursor handling,
different event representation, different tempo-map integration) — so the
two parsers can cross-check each other on the 27 foreign reference .mid
files (tests/test_independent_smf.py). This substitutes for the missing
pretty_midi oracle in this environment: a bug would have to be introduced
independently, twice, to pass.

Spec facts used (SMF 1.0):
- File = "MThd" chunk (format, ntrks, division) then "MTrk" chunks.
- Track body = sequence of <delta-time VLQ> <event>.
- VLQ: big-endian 7-bit groups, high bit = continuation.
- Channel messages 0x8n..0xEn; running status repeats the last channel
  status when the first data byte has the high bit clear.
- 0xC0/0xD0 take one data byte, other channel messages two.
- Meta = 0xFF <type> <len VLQ> <bytes>; tempo = type 0x51, 3-byte
  microseconds per quarter note; end-of-track = 0x2F.
- Sysex 0xF0/0xF7 = <len VLQ> <bytes>, skipped.
- Note-on with velocity 0 is a note-off.
- Default tempo 120 BPM = 500000 us/qn.
"""
from __future__ import annotations

import struct
from typing import Dict, List, NamedTuple, Tuple


class OracleNote(NamedTuple):
    track: int
    channel: int
    program: int
    pitch: int
    velocity: int
    start_tick: int
    end_tick: int
    start_sec: float
    end_sec: float


class _Cursor:
    __slots__ = ("buf", "i")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def u8(self) -> int:
        b = self.buf[self.i]
        self.i += 1
        return b

    def peek(self) -> int:
        return self.buf[self.i]

    def take(self, n: int) -> bytes:
        out = self.buf[self.i : self.i + n]
        self.i += n
        return out

    def vlq(self) -> int:
        v = 0
        for _ in range(4):
            b = self.u8()
            v = (v << 7) + (b & 0x7F)
            if b < 0x80:
                return v
        raise ValueError("VLQ longer than 4 bytes")

    def done(self) -> bool:
        return self.i >= len(self.buf)


def _split_chunks(data: bytes) -> Tuple[int, List[bytes]]:
    if len(data) < 14 or data[0:4] != b"MThd":
        raise ValueError("missing MThd")
    (hlen,) = struct.unpack_from(">I", data, 4)
    _fmt, _ntrks, division = struct.unpack_from(">HHH", data, 8)
    if division >= 0x8000:
        raise ValueError("SMPTE division unsupported")
    off = 8 + hlen
    bodies: List[bytes] = []
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        (clen,) = struct.unpack_from(">I", data, off + 4)
        if tag == b"MTrk":
            bodies.append(data[off + 8 : off + 8 + clen])
        off += 8 + clen
    return division, bodies


def _track_messages(body: bytes):
    """Yield (abs_tick, status_byte, data_bytes) channel/meta messages."""
    cur = _Cursor(body)
    t = 0
    status = 0
    while not cur.done():
        t += cur.vlq()
        first = cur.peek()
        if first >= 0x80:
            status = cur.u8()
        elif status < 0x80 or status >= 0xF0:
            raise ValueError("dangling running status")
        if status == 0xFF:
            mtype = cur.u8()
            mdata = cur.take(cur.vlq())
            yield t, 0xFF, bytes([mtype]) + mdata
            if mtype == 0x2F:
                return
        elif status == 0xF0 or status == 0xF7:
            cur.take(cur.vlq())
        else:
            n = 1 if (status >> 4) in (0xC, 0xD) else 2
            yield t, status, cur.take(n)


def _tempo_segments(tracks: List[List[tuple]]) -> List[Tuple[int, int, float]]:
    """Merged tempo map as (tick, us_per_qn, seconds_at_tick) segments.

    Multiple tempo events at one tick: the one appearing last (scanning
    tracks in order, events in track order) wins — matching how a
    sequencer that processes the merged stream would end up.
    """
    raw: List[Tuple[int, int, int]] = []  # (tick, order, us)
    order = 0
    for msgs in tracks:
        for t, status, data in msgs:
            if status == 0xFF and data and data[0] == 0x51 and len(data) >= 4:
                raw.append((t, order, (data[1] << 16) | (data[2] << 8) | data[3]))
                order += 1
    raw.sort()
    merged: List[Tuple[int, int]] = []
    for t, _o, us in raw:
        if merged and merged[-1][0] == t:
            merged[-1] = (t, us)
        else:
            merged.append((t, us))
    if not merged or merged[0][0] != 0:
        merged.insert(0, (0, 500000))
    return merged


def _seconds_fn(segments: List[Tuple[int, int]], ppq: int):
    anchors: List[Tuple[int, float, int]] = []  # (tick, sec, us)
    sec = 0.0
    prev_tick, prev_us = segments[0]
    anchors.append((prev_tick, 0.0, prev_us))
    for tick, us in segments[1:]:
        sec += (tick - prev_tick) * prev_us / (ppq * 1_000_000.0)
        anchors.append((tick, sec, us))
        prev_tick, prev_us = tick, us

    def at(tick: int) -> float:
        lo, hi = 0, len(anchors) - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if anchors[mid][0] <= tick:
                lo = mid
            else:
                hi = mid - 1
        a_tick, a_sec, a_us = anchors[lo]
        return a_sec + (tick - a_tick) * a_us / (ppq * 1_000_000.0)

    return at, anchors


def read_notes(path: str):
    """Parse an SMF file into note events + tempo map.

    Returns (notes, tempo_anchors) where notes is a list of OracleNote and
    tempo_anchors is [(tick, seconds, us_per_qn)].

    Note pairing: a note-off (or velocity-0 note-on) closes the OLDEST open
    note of that (channel, pitch) in the same track that did not start on
    the same tick (zero-length notes are not produced by same-tick pairs;
    unmatched note-ons are dropped).
    """
    with open(path, "rb") as f:
        data = f.read()
    ppq, bodies = _split_chunks(data)
    tracks = [list(_track_messages(b)) for b in bodies]
    at, anchors = _seconds_fn(_tempo_segments(tracks), ppq)

    notes: List[OracleNote] = []
    for ti, msgs in enumerate(tracks):
        prog: Dict[int, int] = {}
        pending: Dict[Tuple[int, int], List[Tuple[int, int, int]]] = {}
        for t, status, d in msgs:
            if status == 0xFF:
                continue
            hi, ch = status >> 4, status & 0x0F
            if hi == 0xC:
                prog[ch] = d[0]
            elif hi == 0x9 and d[1] != 0:
                pending.setdefault((ch, d[0]), []).append((t, d[1], prog.get(ch, 0)))
            elif hi == 0x8 or (hi == 0x9 and d[1] == 0):
                q = pending.get((ch, d[0]))
                if not q:
                    continue
                pick = next((j for j, e in enumerate(q) if e[0] != t), None)
                if pick is None:
                    continue
                t0, vel, pg = q.pop(pick)
                notes.append(
                    OracleNote(ti, ch, pg, d[0], vel, t0, t, at(t0), at(t))
                )
    notes.sort()
    return notes, anchors
