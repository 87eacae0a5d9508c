"""Native fastloader tests: parity with the Python assembler, slot recycling."""
import numpy as np
import pytest

from ml_music_style_transfer_tpu.data import fastloader


class _FakeDS:
    """Minimal stand-in exposing the ChunkDataset array attributes."""

    def __init__(self, n=20, t=30, p=128, bins=64, seed=0):
        rng = np.random.default_rng(seed)
        self.pianoroll = rng.random((n, t, p)).astype(np.float32)
        self.onoff = rng.random((n, t, p)).astype(np.float32)
        self.styles = ["spec_a", "spec_b"]
        self.specs = {s: rng.random((n, t, bins)).astype(np.float32) for s in self.styles}
        self.n_data = n
        self.rng = np.random.default_rng(seed + 1)


needs_native = pytest.mark.skipif(not fastloader.available(), reason="native lib unavailable")


@needs_native
class TestNativeAssembler:
    def test_matches_manual_gather(self):
        ds = _FakeDS()
        fl = fastloader.NativeBatchAssembler(ds, batch_size=4, n_slots=2, n_threads=1)
        idx = np.array([3, 1, 7, 0])
        cidx = np.array([5, 5, 2, 9])
        style = np.array([0, 1, 0, 1])
        fl.submit(idx, cidx, style)
        slot, batch = fl.next()
        np.testing.assert_array_equal(batch["midi"], ds.pianoroll[idx])
        np.testing.assert_array_equal(batch["onoff"], ds.onoff[idx])
        for j in range(4):
            s = ds.styles[style[j]]
            np.testing.assert_array_equal(batch["target"][j], ds.specs[s][idx[j]])
            np.testing.assert_array_equal(batch["cond"][j], ds.specs[s][cidx[j]])
        fl.release(slot)
        fl.close()

    def test_slot_ring_many_batches(self):
        ds = _FakeDS(n=50)
        fl = fastloader.NativeBatchAssembler(ds, batch_size=5, n_slots=3, n_threads=2)
        for trial in range(20):
            idx = ds.rng.integers(0, ds.n_data, 5)
            cidx = ds.rng.integers(0, ds.n_data, 5)
            style = ds.rng.integers(0, 2, 5)
            fl.submit(idx, cidx, style)
            slot, batch = fl.next()
            np.testing.assert_array_equal(batch["midi"], ds.pianoroll[idx])
            fl.release(slot)
        fl.close()

    def test_bounds_checking(self):
        ds = _FakeDS()
        fl = fastloader.NativeBatchAssembler(ds, batch_size=2, n_slots=2, n_threads=1)
        with pytest.raises(ValueError):
            fl.submit(np.array([0, 99]), np.array([0, 0]), np.array([0, 0]))
        with pytest.raises(ValueError):
            fl.submit(np.array([0, 1]), np.array([0, 0]), np.array([0, 7]))
        fl.close()

    def test_epoch_iteration_covers_data(self):
        ds = _FakeDS(n=12)
        fl = fastloader.NativeBatchAssembler(ds, batch_size=4, n_slots=3, n_threads=1)
        seen = 0
        for batch in fl.epoch_batches(shuffle=True):
            assert batch["midi"].shape == (4, 30, 128)
            seen += 4
        assert seen == 12
        fl.close()
