"""Driver-contract tests: dryrun_multichip executes on the 8-device mesh."""
import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts internally on finite loss

    def test_entry_shapes(self):
        """entry()'s example args follow the reference tensor contract."""
        import __graft_entry__ as g

        fn, args = g.entry()
        params, midi, spec, onoff = args
        assert midi.shape == (1, 860, 128)
        assert spec.shape == (1, 860, 1025)
        assert onoff.shape == (1, 860, 128)
        # abstract-evaluate the full-size forward (no FLOPs on CPU)
        out = jax.eval_shape(fn, params, midi, spec, onoff)
        assert out.shape == (1, 860, 1025)
