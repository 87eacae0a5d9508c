"""Malformed-input robustness for the from-scratch SMF parser.

The reference delegates MIDI robustness to pretty_midi
(/root/reference/model/inference.py:40, preprocessing/preprocess.py:146);
our serving path feeds user-supplied files into midi/parser.py, so the
contract is: any byte string either parses into a MidiFile or raises
ValueError — never a raw IndexError/struct.error, never a hang.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from ml_music_style_transfer_tpu.midi import parser, writer
from ml_music_style_transfer_tpu.midi.parser import Note


def _varlen(v: int) -> bytes:
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _valid_file() -> bytes:
    return writer.write_midi_bytes(
        [Note(60, 100, 0.0, 0.5), Note(64, 90, 0.25, 1.0),
         Note(67, 80, 0.5, 1.5)])


def _assert_clean(raw: bytes):
    """Parsing must yield a MidiFile or a ValueError, nothing else."""
    try:
        mf = parser.parse_midi_bytes(raw)
    except ValueError:
        return None
    assert isinstance(mf, parser.MidiFile)
    for n in mf.notes:
        assert 0 <= n.pitch <= 127
        assert n.end > n.start
    return mf


class TestTruncation:
    def test_every_prefix_is_clean(self):
        raw = _valid_file()
        for cut in range(len(raw)):
            _assert_clean(raw[:cut])

    def test_empty_and_tiny(self):
        for raw in (b"", b"M", b"MThd", b"MThd\x00\x00\x00\x06\x00"):
            with pytest.raises(ValueError):
                parser.parse_midi_bytes(raw)


class TestHeaderLies:
    def test_header_length_below_spec(self):
        raw = b"MThd" + struct.pack(">IHHH", 2, 0, 1, 480)
        with pytest.raises(ValueError):
            parser.parse_midi_bytes(raw)

    def test_track_count_exceeds_tracks(self):
        raw = _valid_file()
        # claim 9 tracks; the file has 1
        lied = raw[:10] + struct.pack(">H", 9) + raw[12:]
        with pytest.raises(ValueError, match="track"):
            parser.parse_midi_bytes(lied)

    def test_track_length_past_eof(self):
        raw = _valid_file()
        i = raw.index(b"MTrk") + 4
        lied = raw[:i] + struct.pack(">I", 1 << 24) + raw[i + 4:]
        with pytest.raises(ValueError, match="past end"):
            parser.parse_midi_bytes(lied)

    def test_not_a_track_chunk(self):
        raw = _valid_file()
        i = raw.index(b"MTrk")
        with pytest.raises(ValueError, match="track"):
            parser.parse_midi_bytes(raw[:i] + b"XTrk" + raw[i + 4:])


class TestEventGarbage:
    def _track(self, body: bytes, division: int = 480) -> bytes:
        return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
                + b"MTrk" + struct.pack(">I", len(body)) + body)

    def test_varlen_bomb(self):
        # unbounded continuation bytes: must fail fast, not scan forever
        with pytest.raises(ValueError, match="variable-length"):
            parser.parse_midi_bytes(self._track(b"\x80" * 64 + b"\x00"))

    def test_data_byte_without_running_status(self):
        with pytest.raises(ValueError, match="running status"):
            parser.parse_midi_bytes(self._track(b"\x00\x3c\x40"))

    def test_unsupported_status(self):
        # 0xF4 is undefined in SMF
        with pytest.raises(ValueError, match="status"):
            parser.parse_midi_bytes(self._track(b"\x00\xf4\x00"))

    def test_sysex_length_past_end(self):
        body = b"\x00\xf0" + _varlen(1000) + b"\x01\x02"
        # sysex payload claimed longer than the track: skipped region runs
        # off the body; the parser must end cleanly (pos>n) with no notes
        mf = _assert_clean(self._track(body))
        if mf is not None:
            assert mf.notes == []

    def test_note_on_without_off(self):
        body = b"\x00\x90\x3c\x64\x00\xff\x2f\x00"
        mf = parser.parse_midi_bytes(self._track(body))
        assert mf.notes == []  # dangling note-on is dropped, not crashed

    def test_data_byte_with_high_bit(self):
        # pitch/velocity >= 0x80 would index past the (T, 128) piano roll
        for body in (b"\x00\x90\x90\x40", b"\x00\x90\x3c\x90"):
            with pytest.raises(ValueError, match="data byte"):
                parser.parse_midi_bytes(self._track(body + b"\x00\xff\x2f\x00"))

    def test_zero_ticks_per_quarter_metrical(self):
        with pytest.raises(ValueError, match="quarter"):
            parser.parse_midi_bytes(
                self._track(b"\x00\x90\x3c\x40\x10\x80\x3c\x00", division=0))

    def test_zero_ticks_per_frame_smpte(self):
        division = ((256 - 25) << 8) | 0  # SMPTE 25 fps, 0 ticks/frame
        with pytest.raises(ValueError, match="SMPTE"):
            parser.parse_midi_bytes(self._track(b"\x00\xff\x2f\x00", division))


class TestMutationFuzz:
    def test_random_single_byte_mutations(self):
        raw = bytearray(_valid_file())
        rng = np.random.default_rng(0)
        for _ in range(400):
            i = int(rng.integers(0, len(raw)))
            old = raw[i]
            raw[i] = int(rng.integers(0, 256))
            _assert_clean(bytes(raw))
            raw[i] = old

    def test_random_garbage(self):
        rng = np.random.default_rng(1)
        for _ in range(100):
            n = int(rng.integers(0, 200))
            _assert_clean(rng.integers(0, 256, n).astype(np.uint8).tobytes())

    def test_garbage_with_valid_header(self):
        rng = np.random.default_rng(2)
        head = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
        for _ in range(100):
            n = int(rng.integers(0, 120))
            body = rng.integers(0, 256, n).astype(np.uint8).tobytes()
            track = b"MTrk" + struct.pack(">I", len(body)) + body
            _assert_clean(head + track)
