"""Driver-contract tests for __graft_entry__.

The round-1 failure mode (MULTICHIP_r01.json) was dryrun_multichip dying in
the *driver's* environment — a bare invocation where the preset platform
exposes a single device — while the in-conftest test passed on the friendly
8-CPU mesh. The contract test therefore runs dryrun_multichip in a
subprocess that reproduces the driver's conditions: no conftest, a platform
that starts with ONE device, and no pre-set virtual-device flags.
"""
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class TestGraftEntry:
    def test_dryrun_multichip_8_in_process(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts internally on finite loss

    def test_dryrun_multichip_driver_contract(self):
        """Bare subprocess, 1 visible device, no conftest: must still pass.

        Mimics MULTICHIP_r01's environment: the interpreter starts with a
        single-device platform (here: plain CPU without the force-count
        flag) and dryrun_multichip(8) must self-configure a virtual 8-device
        mesh. Covers the exact regression the driver judges.
        """
        env = dict(os.environ)
        # strip everything the conftest/test harness set up
        env.pop("MMST_DRYRUN_REEXEC", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        code = (
            "import jax; assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=560,
        )
        assert proc.returncode == 0, proc.stdout[-4000:]
        assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-4000:]

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
