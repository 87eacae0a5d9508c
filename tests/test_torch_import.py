"""Torch-checkpoint importer tests: layout rules (functional parity vs torch)
and structural completeness of the key mapping against our param tree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.compat import torch_import as ti
from ml_music_style_transfer_tpu.config import ModelConfig
from ml_music_style_transfer_tpu.models import PerformanceNet, layers

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


class TestLayoutRules:
    def test_conv_weight_layout(self):
        import torch
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 12, 40)).astype(np.float32)  # (B, C, T) torch
        conv = torch.nn.Conv1d(12, 8, 3, padding=1)
        with torch.no_grad():
            want = conv(torch.from_numpy(x)).numpy()
        m = layers.Conv1x3(8, jnp.float32)
        params = {"params": {"Conv_0": {
            "kernel": ti._conv_w(conv.weight.detach().numpy()),
            "bias": conv.bias.detach().numpy()}}}
        got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
        np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)

    def test_conv_transpose_weight_layout(self):
        import torch
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 6, 10)).astype(np.float32)
        tt = torch.nn.ConvTranspose1d(6, 4, 4, stride=2, padding=1)
        with torch.no_grad():
            want = tt(torch.from_numpy(x)).numpy()
        m = layers.ConvTranspose1dTorch(4, 4, 2, 1, jnp.float32)
        params = {"params": {
            "kernel": ti._convT_w(tt.weight.detach().numpy()),
            "bias": tt.bias.detach().numpy()}}
        got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
        np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)

    def test_linear_weight_layout(self):
        import torch
        lin = torch.nn.Linear(10, 6)
        x = np.random.default_rng(2).standard_normal((4, 10)).astype(np.float32)
        with torch.no_grad():
            want = lin(torch.from_numpy(x)).numpy()
        got = x @ ti._lin_w(lin.weight.detach().numpy()) + lin.bias.detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def _reference_key_list():
    """Every parameterized key pattern the reference state_dict contains
    (model.py:187-246: 5 down convs x2 branches, 5 dense concats, 4 up convs,
    4 MBR blocks with 2/4/8/16 bands, lastconv, onset encoder depth 3)."""
    keys = []
    for i in range(5):
        for br in ("down_convs", "down_convs_audio"):
            for c in ("conv1", "conv2"):
                keys += [f"{br}.{i}.{c}.weight", f"{br}.{i}.{c}.bias"]
        for fc in ("fc1", "fc2"):
            keys += [f"dense_concats.{i}.{fc}.weight", f"dense_concats.{i}.{fc}.bias"]
    for i in range(4):
        keys += [f"up_convs.{i}.upconv.weight", f"up_convs.{i}.upconv.bias"]
        for c in ("conv1", "conv2"):
            keys += [f"up_convs.{i}.{c}.weight", f"up_convs.{i}.{c}.bias"]
    for j, bands in enumerate((2, 4, 8, 16), start=1):
        for lst in ("conv_list1", "conv_list2"):
            for b in range(bands):
                keys += [f"MBRBlock{j}.{lst}.{b}.weight", f"MBRBlock{j}.{lst}.{b}.bias"]
    keys += ["lastconv.weight", "lastconv.bias"]
    for i in range(3):
        for c in ("conv1", "conv2"):
            keys += [f"onset_offset_encoder.down_convs.{i}.{c}.weight",
                     f"onset_offset_encoder.down_convs.{i}.{c}.bias"]
    return keys


def _tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= _tree_paths(v, p)
        else:
            out.add(p)
    return out


class TestStructuralCompleteness:
    def test_every_reference_key_maps_and_covers_our_tree(self):
        # synthetic state_dict: shapes don't matter for the path check
        fake = {k: np.zeros((2, 2, 3) if k.endswith("weight") else (2,), np.float32)
                for k in _reference_key_list()}
        converted = ti.convert_state_dict(fake)
        got_paths = _tree_paths(converted["params"])

        model = PerformanceNet(TINY)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 220, 128)), jnp.zeros((1, 220, 1025)), jnp.zeros((1, 220, 128)),
        )
        want_paths = _tree_paths(jax.tree_util.tree_map(lambda x: None, shapes)["params"])
        assert got_paths == want_paths, (
            f"missing={sorted(want_paths - got_paths)[:5]} "
            f"extra={sorted(got_paths - want_paths)[:5]}"
        )

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError, match="unmapped"):
            ti.convert_state_dict({"mystery.weight": np.zeros((2, 2, 3))})
