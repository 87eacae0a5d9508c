"""MIDI subsystem tests: SMF round-trip, roll vectorization, onoff parity.

Covers the reference behaviors at preprocessing/preprocess.py:139-160 and the
reverse-pianoroll debug path (pretty_midi_roll_to_midi.py).
"""
import numpy as np
import jax.numpy as jnp

from ml_music_style_transfer_tpu.midi import parser, writer, pianoroll
from ml_music_style_transfer_tpu.midi.parser import Note
import ml_music_style_transfer_tpu.ops.pianoroll as jroll

FS = 172  # reference wps (preprocess.py:41)


def _demo_notes():
    return [
        Note(60, 96, 0.00, 0.50),
        Note(64, 80, 0.25, 0.75),
        Note(67, 70, 0.50, 1.00),
        Note(60, 90, 0.60, 0.90),   # re-trigger same pitch
        Note(72, 127, 0.90, 1.50),
    ]


def _onoff_reference_loop(roll):
    """The reference's literal O(T) implementation (preprocess.py:150-155)."""
    onoff = np.zeros(roll.shape)
    for i in range(roll.shape[0]):
        if i == 0:
            onoff[i][roll[i].nonzero()] = 1
        else:
            onoff[i][np.setdiff1d(roll[i - 1].nonzero(), roll[i].nonzero())] = -1
            onoff[i][np.setdiff1d(roll[i].nonzero(), roll[i - 1].nonzero())] = 1
    return onoff


class TestSMFRoundTrip:
    def test_write_parse_roundtrip(self):
        notes = _demo_notes()
        raw = writer.write_midi_bytes(notes)
        mf = parser.parse_midi_bytes(raw)
        assert len(mf.notes) == len(notes)
        got = sorted(mf.notes, key=lambda n: (n.start, n.pitch))
        want = sorted(notes, key=lambda n: (n.start, n.pitch))
        for g, w in zip(got, want):
            assert g.pitch == w.pitch
            assert g.velocity == w.velocity
            assert abs(g.start - w.start) < 2e-3
            assert abs(g.end - w.end) < 2e-3

    def test_file_io(self, tmp_path):
        p = str(tmp_path / "demo.mid")
        writer.save(p, _demo_notes())
        mf = parser.load(p)
        assert len(mf.notes) == 5
        assert mf.end_time > 1.4

    def test_tempo_change_handling(self):
        # hand-build a file with a mid-stream tempo change and check timing
        notes = [Note(60, 100, 0.0, 1.0)]
        raw = writer.write_midi_bytes(notes, tempo=250000)  # 240 bpm
        mf = parser.parse_midi_bytes(raw)
        assert abs(mf.notes[0].end - 1.0) < 2e-3

    def _smpte_file(self, fps_byte, tpf, events):
        """Hand-assemble a format-0 SMF with SMPTE division.

        ``events``: [(delta_ticks, status, data...)]. The golden timing
        model is pretty_midi/mido's: tick = 1/(fps*tpf) s, fps code 29
        = 29.97 (reference accepts these via pretty_midi,
        preprocess.py:146)."""
        import struct
        division = ((256 - fps_byte) << 8) | tpf  # e.g. -25 -> 0xE7

        def varlen(v):
            out = [v & 0x7F]
            v >>= 7
            while v:
                out.append(0x80 | (v & 0x7F))
                v >>= 7
            return bytes(reversed(out))

        track = b""
        for delta, *msg in events:
            track += varlen(delta) + bytes(msg)
        track += bytes([0, 0xFF, 0x2F, 0x00])  # end of track
        return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
                + b"MTrk" + struct.pack(">I", len(track)) + track)

    def test_smpte_division_timing(self):
        # 25 fps x 40 ticks/frame = 1000 ticks/sec: note on at tick 0,
        # off after 200 ticks = 0.2 s exactly
        raw = self._smpte_file(25, 40, [
            (0, 0x90, 60, 100),
            (200, 0x80, 60, 0),
        ])
        mf = parser.parse_midi_bytes(raw)
        assert len(mf.notes) == 1
        n = mf.notes[0]
        assert n.pitch == 60 and n.velocity == 100
        assert abs(n.start - 0.0) < 1e-9
        assert abs(n.end - 0.2) < 1e-9

    def test_smpte_ignores_tempo_meta_and_handles_drop_frame(self):
        # tempo meta events must NOT affect SMPTE timing (absolute-time
        # division); fps code 29 means NTSC 29.97
        raw = self._smpte_file(29, 100, [
            (0, 0xFF, 0x51, 0x03, 0x0F, 0x42, 0x40),  # tempo 1e6 us/qn (ignored)
            (0, 0x90, 72, 64),
            (150, 0x80, 72, 0),
        ])
        mf = parser.parse_midi_bytes(raw)
        n = mf.notes[0]
        assert abs(n.end - 150 / (29.97 * 100)) < 1e-9


class TestPianoroll:
    def test_roll_rasterization(self):
        notes = _demo_notes()
        roll = pianoroll.notes_to_pianoroll(notes, FS)
        assert roll.shape == (int(np.ceil(1.5 * FS)), 128)
        # note 60 active on [0, 0.5): frame int(0.49*FS) active, frame int(0.5*FS) not
        assert roll[int(0.49 * FS), 60] > 0
        assert roll[int(0.5 * FS) + 1, 60] == 0  # gap before re-trigger at 0.6
        assert roll[int(0.7 * FS), 60] > 0

    def test_binarize_and_onoff_match_reference_loop(self):
        notes = _demo_notes()
        roll, onoff = pianoroll.vectorize_notes(notes, FS)
        assert set(np.unique(roll)).issubset({0.0, 1.0})
        np.testing.assert_array_equal(onoff, _onoff_reference_loop(roll))

    def test_onoff_random_rolls(self):
        rng = np.random.default_rng(0)
        roll = (rng.random((200, 128)) < 0.05).astype(np.float64)
        np.testing.assert_array_equal(
            pianoroll.onset_offset(roll), _onoff_reference_loop(roll)
        )

    def test_jax_onoff_matches_numpy(self):
        rng = np.random.default_rng(1)
        roll = (rng.random((300, 128)) < 0.08).astype(np.float32)
        got = np.asarray(jroll.onset_offset(jnp.asarray(roll)))
        np.testing.assert_array_equal(got, pianoroll.onset_offset(roll))

    def test_jax_onoff_batched(self):
        rng = np.random.default_rng(2)
        rolls = (rng.random((4, 100, 128)) < 0.1).astype(np.float32)
        got = np.asarray(jroll.onset_offset(jnp.asarray(rolls)))
        for i in range(4):
            np.testing.assert_array_equal(got[i], pianoroll.onset_offset(rolls[i]))

    def test_jax_rasterizer_matches_numpy(self):
        notes = _demo_notes()
        length = int(np.ceil(1.5 * FS))
        pitches = jnp.asarray([n.pitch for n in notes])
        vels = jnp.asarray([float(n.velocity) for n in notes])
        starts = jnp.asarray([n.start for n in notes])
        ends = jnp.asarray([n.end for n in notes])
        got = np.asarray(jroll.notes_to_pianoroll(pitches, vels, starts, ends, FS, length))
        want = pianoroll.notes_to_pianoroll(notes, FS, length)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_roll_to_notes_roundtrip(self):
        notes = _demo_notes()
        roll = pianoroll.binarize(pianoroll.notes_to_pianoroll(notes, FS))
        rec = pianoroll.pianoroll_to_notes(roll, FS)
        rec_roll = pianoroll.binarize(
            pianoroll.notes_to_pianoroll(rec, FS, length=roll.shape[0])
        )
        np.testing.assert_array_equal(rec_roll, roll)
