"""Torch-checkpoint exporter tests (compat/torch_export.py): the inverse of
the importer. Round-trip through both converters must be bit-exact, and the
exported key set must be exactly the reference state_dict's
(model/train.py:204 writer layout; end-to-end strict load into the actual
reference model is scripts/verify_torch_import.py --export)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.compat import torch_export as te
from ml_music_style_transfer_tpu.compat import torch_import as ti
from ml_music_style_transfer_tpu.config import ModelConfig
from ml_music_style_transfer_tpu.models import PerformanceNet

from test_torch_import import _reference_key_list, _tree_paths

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_params():
    model = PerformanceNet(TINY)
    return jax.jit(model.init)(
        jax.random.PRNGKey(3),
        jnp.zeros((1, 220, 128)), jnp.zeros((1, 220, 1025)),
        jnp.zeros((1, 220, 128)))


class TestExport:
    def test_key_set_matches_reference_state_dict(self, tiny_params):
        state = te.to_state_dict(tiny_params)
        assert set(state) == set(_reference_key_list())

    def test_round_trip_is_bit_exact(self, tiny_params):
        back = ti.convert_state_dict(te.to_state_dict(tiny_params))
        want = jax.tree_util.tree_map(np.asarray, tiny_params)
        assert _tree_paths(back["params"]) == _tree_paths(want["params"])
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
        for path, leaf in flat_b:
            np.testing.assert_array_equal(leaf, flat_w[path],
                                          err_msg=str(path))

    def test_torch_layouts_invert_import(self):
        rng = np.random.default_rng(4)
        w_conv = rng.standard_normal((8, 12, 3)).astype(np.float32)
        np.testing.assert_array_equal(te._conv_w(ti._conv_w(w_conv)), w_conv)
        w_ct = rng.standard_normal((6, 4, 4)).astype(np.float32)
        np.testing.assert_array_equal(te._convT_w(ti._convT_w(w_ct)), w_ct)
        w_lin = rng.standard_normal((6, 10)).astype(np.float32)
        np.testing.assert_array_equal(te._lin_w(ti._lin_w(w_lin)), w_lin)

    def test_save_and_reload_tar(self, tiny_params, tmp_path):
        import torch

        path = str(tmp_path / "checkpoint-7.tar")
        te.save_reference_checkpoint(path, tiny_params, epoch=7)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert ckpt["epoch"] == 7 and ckpt["optimizer"] is None
        assert set(ckpt["state_dict"]) == set(_reference_key_list())
        # and the file loads back through the importer bit-exactly
        back = ti.load_reference_checkpoint(path)
        flat_w = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, tiny_params)))
        for path_k, leaf in jax.tree_util.tree_leaves_with_path(back):
            np.testing.assert_array_equal(leaf, flat_w[path_k])

    def test_unknown_module_raises(self):
        with pytest.raises(KeyError, match="unmapped"):
            te.to_state_dict({"params": {"mystery": {
                "kernel": np.zeros((3, 2, 2), np.float32),
                "bias": np.zeros((2,), np.float32)}}})
