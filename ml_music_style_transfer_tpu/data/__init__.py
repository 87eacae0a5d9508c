"""Data layer: audio IO, chunking, HDF5 store, preprocessing, curation."""
from . import audio_io, chunking, hdf5_store, musicnet  # noqa: F401
