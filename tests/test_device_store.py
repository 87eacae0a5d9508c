"""Device-resident dataset tests: on-device batch assembly parity + fit()."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.config import ModelConfig, TrainConfig
from ml_music_style_transfer_tpu.data import preprocess as pp
from ml_music_style_transfer_tpu.data.dataset import ChunkDataset
from ml_music_style_transfer_tpu.data.device_store import DeviceDataStore, gather_batch
from ml_music_style_transfer_tpu.train.loop import Trainer
from ml_music_style_transfer_tpu.testing import synthetic

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


@pytest.fixture(scope="module")
def audio_h5(tmp_path_factory):
    root = tmp_path_factory.mktemp("devdata")
    synthetic.make_dataset_dir(str(root / "raw"), song_ids=[9], styles=["cuba", "upright"],
                               duration=16.0, seed=8)
    for dt in ("train", "test"):
        pp.get_data(str(root / "raw"), str(root / "ds"), dt,
                    song_ids=[9], styles=["cuba", "upright"], store_audio=True)
    return str(root / "ds")


class TestDeviceStore:
    def test_loads_and_shapes(self, audio_h5):
        store = DeviceDataStore(audio_h5 + "_train.hdf5")
        assert store.styles == ["cuba", "upright"]
        assert store.audio.shape[0] == 2
        assert store.audio.shape[1] == store.n_data
        assert store.audio.dtype == jnp.bfloat16
        assert store.pianoroll.dtype == jnp.int8
        assert store.hbm_bytes() > 0

    def test_gather_matches_host_assembly(self, audio_h5):
        """On-device gather+STFT == host ChunkDataset assembly (bf16 tol)."""
        store = DeviceDataStore(audio_h5 + "_train.hdf5")
        ds = ChunkDataset(audio_h5 + "_train.hdf5")
        idx = jnp.asarray([0, 2, 1], jnp.int32)
        cidx = jnp.asarray([1, 0, 2], jnp.int32)
        style = jnp.asarray([0, 1, 0], jnp.int32)
        batch = jax.jit(gather_batch)(store.audio, store.pianoroll, store.onoff,
                                      idx, cidx, style)
        np.testing.assert_array_equal(np.asarray(batch["midi"]), ds.pianoroll[[0, 2, 1]])
        np.testing.assert_array_equal(np.asarray(batch["onoff"]), ds.onoff[[0, 2, 1]])
        # target[j] = spec of style[j] at idx[j]; HDF5 spec is float32-exact,
        # device recomputes from bf16 audio -> tolerance
        for j, (i, s) in enumerate(zip([0, 2, 1], ["cuba", "upright", "cuba"])):
            want = ds.specs[f"spec_{s}"][i]
            got = np.asarray(batch["target"][j])
            assert np.mean(np.abs(got - want)) < 0.02, (j, np.mean(np.abs(got - want)))

    def test_resident_step_trains(self, audio_h5):
        tr = Trainer(TINY, TrainConfig(batch_size=2))
        params, opt_state = tr.init_state(0)
        store = DeviceDataStore(audio_h5 + "_train.hdf5")
        losses = []
        rng = jax.random.PRNGKey(0)
        for _ in range(6):
            for idx, cidx, style in store.draw_epoch_indices(2):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = tr.train_step_resident(
                    params, opt_state, store.audio, store.pianoroll, store.onoff,
                    idx, cidx, style, sub)
                losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_fit_device_resident(self, audio_h5, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = TrainConfig(epochs=1, test_freq=1, exp_name="dr", batch_size=2)
        tr = Trainer(TINY, cfg)
        params, exp = tr.fit(audio_h5, device_resident=True)
        assert len(exp.loss_history) == 1
        assert exp.best_epoch == 1

    def test_missing_audio_keys_clear_error(self, audio_h5, tmp_path):
        # a dataset preprocessed WITHOUT --store-audio must fail clearly
        import h5py
        from ml_music_style_transfer_tpu.data.hdf5_store import H5Store
        p = str(tmp_path / "noaudio_train.hdf5")
        with h5py.File(p, "w") as f:
            H5Store(f).write_pianoroll(np.zeros((2, 860, 128)), np.zeros((2, 860, 128)))
        with pytest.raises(ValueError, match="store-audio"):
            DeviceDataStore(p)


class TestResidentEval:
    def test_evaluate_resident_weighted_exact_and_deterministic(self, audio_h5):
        """Resident eval covers every chunk once (zero-weight padding) and
        repeated calls return the identical loss (stable plateau signal)."""
        tr = Trainer(TINY, TrainConfig(batch_size=2))
        params, _ = tr.init_state(0)
        store = DeviceDataStore(audio_h5 + "_test.hdf5")
        seen = []
        total_w = 0.0
        for idx, cidx, style, weight in store.eval_epoch_indices(2):
            seen.extend(np.asarray(idx)[np.asarray(weight) > 0].tolist())
            total_w += float(np.sum(np.asarray(weight)))
        assert sorted(seen) == list(range(store.n_data))
        assert total_w == store.n_data
        l1 = tr.evaluate_resident(store, params)
        l2 = tr.evaluate_resident(store, params)
        assert l1 == l2
        assert np.isfinite(l1) and l1 > 0

    def test_fit_device_resident_uses_resident_eval(self, audio_h5, tmp_path,
                                                    monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        cfg = TrainConfig(epochs=1, test_freq=1, exp_name="dre", batch_size=2)
        tr = Trainer(TINY, cfg)
        tr.fit(audio_h5, device_resident=True)
        out = capsys.readouterr().out
        assert "Test set loss" in out and "(device-resident)" in out
