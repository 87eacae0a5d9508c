"""Data-format interoperability with the UNMODIFIED reference.

compat/torch_export.py already proves checkpoint interop in both directions;
this file proves the same for the HDF5 *dataset* format (the other artifact a
user migrating either way carries):

  1. Our preprocess output (float32, data/hdf5_store.py) loads in the
     reference's OWN ``Dataseth5py`` (/root/reference/model/train.py:45-104,
     imported read-only) with the exact ``__getitem__`` tensor contract —
     a reference user can keep training the unmodified reference on datasets
     produced by this framework.
  2. A reference-written float64 HDF5 (io_manager.py:39-77 schema: float64,
     resizable, index-aligned keys) loads in our ``ChunkDataset`` and
     assembles training batches — existing reference datasets migrate here
     unchanged.

Both tests are skipped cleanly when /root/reference is absent.
"""
from __future__ import annotations

import importlib.util
import os
import sys

import h5py
import numpy as np
import pytest

from ml_music_style_transfer_tpu.data import preprocess as pp
from ml_music_style_transfer_tpu.data.dataset import ChunkDataset
from ml_music_style_transfer_tpu.testing import synthetic

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def reference_train():
    """The reference's model/train.py, imported read-only under a private
    module name (it needs /root/reference/model on sys.path for its own
    ``from model import PerformanceNet``; we remove the entry afterwards)."""
    ref_dir = os.path.join(REFERENCE, "model")
    sys.path.insert(0, ref_dir)
    try:
        spec = importlib.util.spec_from_file_location(
            "_reference_train", os.path.join(ref_dir, "train.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(ref_dir)
    return mod


@pytest.fixture(scope="module")
def our_hdf5(tmp_path_factory):
    """A small dataset preprocessed by THIS framework (float32 store)."""
    d = tmp_path_factory.mktemp("interop_src")
    synthetic.make_dataset_dir(str(d), song_ids=[101], styles=["cuba", "upright"],
                               duration=22.0, seed=7)
    return pp.get_data(str(d), str(tmp_path_factory.mktemp("interop_out") / "ds"),
                       "train", song_ids=[101], styles=["cuba", "upright"])


class TestReferenceLoaderReadsOurHDF5:
    def test_getitem_contract(self, reference_train, our_hdf5):
        """The unmodified reference Dataseth5py (train.py:45-104) on our
        file: styles discovered from spec_* keys, __getitem__ returns
        X (256, 860) = [roll ⊕ onoff]ᵀ, X_cond/y (1025, 860) torch tensors."""
        ds = reference_train.Dataseth5py(our_hdf5)
        assert sorted(ds.styles) == ["spec_cuba", "spec_upright"]
        assert len(ds) > 0
        X, X_cond, y = ds[0]
        assert tuple(X.shape) == (256, 860)
        assert tuple(X_cond.shape) == (1025, 860)
        assert tuple(y.shape) == (1025, 860)
        # binarized roll half, {-1,0,1} onoff half (preprocess.py:148-155)
        xs = set(np.unique(X.numpy()[:128]))
        assert xs.issubset({0.0, 1.0})
        assert set(np.unique(X.numpy()[128:])).issubset({-1.0, 0.0, 1.0})
        assert np.isfinite(y.numpy()).all()

    def test_dataloader_batch(self, reference_train, our_hdf5):
        """The reference's own DataLoader path (Process_Data's loader config,
        train.py:113-116) batches our file into the shapes its train() splits
        (train.py:130)."""
        import torch.utils.data as utils

        ds = reference_train.Dataseth5py(our_hdf5)
        loader = utils.DataLoader(ds, batch_size=2, shuffle=True)
        X, X_cond, y = next(iter(loader))
        assert tuple(X.shape) == (2, 256, 860)
        assert tuple(X_cond.shape) == (2, 1025, 860)
        assert tuple(y.shape) == (2, 1025, 860)


class TestOurLoaderReadsReferenceHDF5:
    @pytest.fixture(scope="class")
    def reference_style_file(self, tmp_path_factory):
        """An HDF5 written the way the reference writes one: float64,
        resizable datasets, two appends (io_manager.py:39-77)."""
        path = str(tmp_path_factory.mktemp("refdata") / "ref_train.hdf5")
        rng = np.random.default_rng(0)
        with h5py.File(path, "w") as f:
            for key, shape in [("pianoroll", (860, 128)), ("onoff", (860, 128)),
                               ("spec_cuba", (1025, 860)),
                               ("spec_upright", (1025, 860))]:
                first = rng.random((3,) + shape)
                ds = f.create_dataset(key, data=first, dtype="float64",
                                      maxshape=(None,) + shape, chunks=True)
                ds.resize(5, axis=0)
                ds[3:] = rng.random((2,) + shape)
        return path

    def test_chunkdataset_loads_and_batches(self, reference_style_file):
        ds = ChunkDataset(reference_style_file, seed=0)
        assert ds.n_data == 5
        assert sorted(ds.styles) == ["spec_cuba", "spec_upright"]
        assert ds.pianoroll.dtype == np.float32  # cast from the ref's float64
        batch = next(ds.epoch_batches(batch_size=4))
        assert batch["midi"].shape == (4, 860, 128)
        assert batch["cond"].shape == (4, 860, 1025)
        assert batch["target"].shape == (4, 860, 1025)
        assert all(v.dtype == np.float32 for k, v in batch.items())

    def test_our_float64_writer_matches_reference_layout(self, tmp_path):
        """H5Store(dtype='float64') (the compat option) emits the reference's
        exact on-disk dtype/shape layout."""
        from ml_music_style_transfer_tpu.data.hdf5_store import H5Store

        p = str(tmp_path / "compat.hdf5")
        with h5py.File(p, "w") as f:
            st = H5Store(f, dtype="float64")
            st.write_pianoroll(np.zeros((2, 860, 128)), np.zeros((2, 860, 128)))
            st.write_spectrum(np.zeros((2, 1025, 860)), "cuba")
        with h5py.File(p, "r") as f:
            assert f["pianoroll"].dtype == np.float64
            assert f["spec_cuba"].dtype == np.float64
            assert f["spec_cuba"].maxshape == (None, 1025, 860)
