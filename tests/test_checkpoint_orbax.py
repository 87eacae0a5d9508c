"""Orbax sharded/async checkpointing (SURVEY §5 'orbax-style pytree
checkpoints'; VERDICT r1 #9).

Save must not require a full host gather; resume must restore straight INTO
the mesh shardings (tested on the 4x2 CPU mesh); the reference's
hyperparams.json best-epoch contract must keep working end to end.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.config import ModelConfig, TrainConfig
from ml_music_style_transfer_tpu.data import preprocess as pp
from ml_music_style_transfer_tpu.parallel import mesh as pmesh
from ml_music_style_transfer_tpu.testing import synthetic
from ml_music_style_transfer_tpu.train import checkpoint as ckpt
from ml_music_style_transfer_tpu.train.loop import Trainer

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


@pytest.fixture(scope="module")
def mesh42():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(4, 2)


class TestShardedSaveRestore:
    def test_restore_into_sharded_buffers_on_4x2_mesh(self, mesh42, tmp_path):
        """Round-trip on a DP x TP mesh: the restored tree must carry the
        template's NamedShardings (device-resident, not host numpy) and the
        exact saved values."""
        tr = Trainer(TINY, TrainConfig(exp_name="orbax1", mesh_shape=(4, 2)),
                     mesh=mesh42)
        params, opt_state = tr.init_state(0)
        state = {"params": params, "opt_state": opt_state, "epoch": 7,
                 "scheduler": tr.scheduler.state_dict()}
        path = ckpt.save_checkpoint_sharded(str(tmp_path), 7, state)
        assert path.endswith("checkpoint-7.orbax")

        # fresh (differently-seeded) sharded template, same mesh
        tr2 = Trainer(TINY, TrainConfig(exp_name="orbax2", mesh_shape=(4, 2)),
                      mesh=mesh42)
        p2, o2 = tr2.init_state(1)
        restored = ckpt.restore_checkpoint_sharded(
            path, {"params": p2, "opt_state": o2, "epoch": 0,
                   "scheduler": tr2.scheduler.state_dict()})

        assert int(restored["epoch"]) == 7
        # values == saved values
        want = jax.tree_util.tree_leaves(jax.device_get(params))
        got = jax.tree_util.tree_leaves(jax.device_get(restored["params"]))
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
        # shardings == the template's mesh shardings (restore-into-sharding)
        tmpl_leaves = jax.tree_util.tree_leaves(p2)
        rest_leaves = jax.tree_util.tree_leaves(restored["params"])
        n_sharded = 0
        for t, r in zip(tmpl_leaves, rest_leaves):
            assert isinstance(r, jax.Array)
            assert r.sharding == t.sharding, (r.sharding, t.sharding)
            if not r.sharding.is_fully_replicated:
                n_sharded += 1
        assert n_sharded > 10  # TP actually shards the big kernels

    def test_params_only_partial_restore(self, mesh42, tmp_path):
        """Inference startup restores ONLY the params subtree — the Adam
        moments (~2x params bytes at flagship size) must not be read
        (restore_params_sharded_host, used by AudioSynthesizer)."""
        tr = Trainer(TINY, TrainConfig(exp_name="orbax3", mesh_shape=(4, 2)),
                     mesh=mesh42)
        params, opt_state = tr.init_state(0)
        state = {"params": params, "opt_state": opt_state, "epoch": 2,
                 "scheduler": tr.scheduler.state_dict()}
        path = ckpt.save_checkpoint_sharded(str(tmp_path), 2, state, wait=True)
        got = ckpt.restore_params_sharded_host(path)
        want = jax.device_get(params)
        assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(want)
        for w, g in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

    def test_latest_checkpoint_sees_orbax_dirs(self, tmp_path):
        d = str(tmp_path)
        os.makedirs(os.path.join(d, "checkpoint-3.orbax"))
        open(os.path.join(d, "checkpoint-2.msgpack"), "wb").close()
        path, epoch = ckpt.latest_checkpoint(d)
        assert epoch == 3 and path.endswith("checkpoint-3.orbax")

    def test_best_checkpoint_resolves_orbax(self, tmp_path):
        exp = ckpt.ExperimentState(1, 1, "x")
        exp.best_epoch = 4
        exp.save(str(tmp_path))
        os.makedirs(os.path.join(str(tmp_path), "checkpoint-4.orbax"))
        path, epoch = ckpt.best_checkpoint(str(tmp_path))
        assert epoch == 4 and path.endswith("checkpoint-4.orbax")

    def test_best_checkpoint_falls_back_when_async_save_never_committed(
            self, tmp_path):
        """Crash window (advisor finding, round 2): hyperparams.json may point
        at an epoch whose async orbax flush never committed (orbax renames a
        tmp dir on commit, so the final path simply doesn't exist). Resolution
        must fall back to the newest checkpoint that DID commit."""
        d = str(tmp_path)
        exp = ckpt.ExperimentState(1, 1, "x")
        exp.best_epoch = 7  # points at a save that never landed
        exp.save(d)
        os.makedirs(os.path.join(d, "checkpoint-5.orbax"))
        open(os.path.join(d, "checkpoint-3.msgpack"), "wb").close()
        path, epoch = ckpt.best_checkpoint(d)
        assert epoch == 5 and path.endswith("checkpoint-5.orbax")


@pytest.fixture(scope="module")
def tiny_h5(tmp_path_factory):
    root = tmp_path_factory.mktemp("orbaxdata")
    synthetic.make_dataset_dir(str(root / "raw"), song_ids=[9],
                               styles=["cuba", "upright"], duration=16.0, seed=6)
    pp.get_data(str(root / "raw"), str(root / "ds"), "train",
                song_ids=[9], styles=["cuba", "upright"])
    pp.get_data(str(root / "raw"), str(root / "ds"), "test",
                song_ids=[9], styles=["cuba", "upright"])
    return str(root / "ds")


class TestOrbaxFitResume:
    def test_fit_resume_and_infer_with_orbax_format(self, tiny_h5, tmp_path,
                                                    monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = TrainConfig(epochs=1, test_freq=1, exp_name="ofit", batch_size=2)
        Trainer(TINY, cfg).fit(tiny_h5, checkpoint_format="orbax")
        exp_dir = os.path.join("experiments", "ofit")
        import json
        with open(os.path.join(exp_dir, "hyperparams.json")) as f:
            best = json.load(f)["best_epoch"]
        assert os.path.isdir(os.path.join(exp_dir, f"checkpoint-{best}.orbax"))

        # resume picks up the orbax checkpoint and restores into shardings
        cfg2 = TrainConfig(epochs=2, test_freq=1, exp_name="ofit", batch_size=2)
        params, exp = Trainer(TINY, cfg2).fit(tiny_h5, resume=True,
                                              checkpoint_format="orbax")
        assert len(exp.loss_history) >= 2

        # inference resolves + loads the orbax checkpoint via best_checkpoint
        from ml_music_style_transfer_tpu.infer import AudioSynthesizer
        from ml_music_style_transfer_tpu.midi import writer as midi_writer
        from ml_music_style_transfer_tpu.data import audio_io
        rng = np.random.default_rng(5)
        notes = synthetic.random_song(rng, duration=6.0)
        midi_writer.save("u.mid", notes)
        audio_io.write_wav("u.wav", synthetic.render_notes(notes, "cuba", 44100, 6.0), 44100)
        synth = AudioSynthesizer(exp_dir, "u.mid", "u.wav", model_cfg=TINY)
        outs = synth.inference(n_iter=2)
        assert os.path.exists(outs[0])
