"""Trained-model quality gate, CPU scale (VERDICT r1 #7).

Round 1 only smoke-tested inference with random weights; this trains the
tiny-width model on a synthetic two-style dataset via the REAL pipeline path
(ChunkDataset.assemble — per-item style/cond pairing, reference
model/train.py:78-91) and asserts the learned model:

  - converges (train loss halves),
  - generalizes content: the held-out chunk's prediction is closer to the
    held-out target than to other chunks' targets (learned MIDI->spectrogram
    structure, not memorization),
  - keeps the conditioning pathway wired (output responds to the cond input),
  - clears a Griffin-Lim invertibility floor on the predicted spectrogram.

Style DISCRIMINATION (prediction closer to the conditioning style's target
than to the other style's) is asserted at FULL width on the real TPU by
scripts/quality_gate_tpu.py -> QUALITY_GATE_TPU.json. It is not reachable at
width 1/16: diagnostics show the tiny decoder learns to null the
audio-derived dims — the conditioning chunk's wrong-note content is noise it
cannot separate from timbre at this capacity (verified invariant to per-item
vs per-batch pairing, L1 vs MSE loss, dropout on/off, and oracle
conditioning; the encoder and fusion stay cond-sensitive throughout — the
collapse is decoder-side and capacity-bound).

(The reference has only human listening for any of this,
tests/test_griffinlim.py.) Marked slow: ~4-6 min of CPU training.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.config import ModelConfig, TrainConfig
from ml_music_style_transfer_tpu.data import preprocess as pp
from ml_music_style_transfer_tpu.data.dataset import ChunkDataset
from ml_music_style_transfer_tpu.ops import griffinlim as jgl
from ml_music_style_transfer_tpu.ops import stft as jstft
from ml_music_style_transfer_tpu.testing import synthetic
from ml_music_style_transfer_tpu.train.loop import Trainer

# gentleman (3 soft harmonics, slow decay) vs harpsichord (6 bright, fast
# decay): maximally distinct synthetic timbres
STYLES = ["gentleman", "harpsichord"]
TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")
B = 4


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("qgate")
    synthetic.make_dataset_dir(str(root / "raw"), song_ids=[11], styles=STYLES,
                               duration=60.0, seed=8)
    pp.get_data(str(root / "raw"), str(root / "ds"), "train",
                song_ids=[11], styles=STYLES)
    cfg = TrainConfig(epochs=1, exp_name="qgate", batch_size=B,
                      learning_rate=1e-3, seed=0)
    tr = Trainer(TINY, cfg)
    ds = ChunkDataset(str(root / "ds") + "_train.hdf5", seed=0)
    # hold out the last chunk entirely (it never appears as an item index;
    # assemble() may still draw it as a conditioning chunk, which leaks no
    # content for the held-out MIDI->target mapping)
    held = ds.n_data - 1
    params, opt_state = tr.init_state(0)
    # host copy: train_step donates params, deleting the init buffers
    init_params = jax.device_get(params)
    rng = jax.random.PRNGKey(0)
    train_idx = np.arange(ds.n_data - 1)
    step_rng = np.random.default_rng(3)
    losses = []
    for epoch in range(100):
        step_rng.shuffle(train_idx)
        for s in range(0, len(train_idx) - B + 1, B):
            idx = train_idx[s : s + B]
            # real pipeline path: per-item style, cond from the same style at
            # a random index (reference Dataseth5py.__getitem__)
            batch = {k: jnp.asarray(v) for k, v in ds.assemble(idx).items()}
            batch["weight"] = jnp.ones((B,), jnp.float32)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = tr.train_step(params, opt_state, batch, sub)
            losses.append(float(loss))
    return tr, params, init_params, ds, held, losses


class TestFixtureInvariantCriterion:
    """testing/quality.py — the round-4 replacement for the absolute
    own/best-other ratio bar (recalibrated three times in two rounds because
    it drifted with fixture proximity; history in BASELINE.md)."""

    # the committed 5-style seed-0 TPU run (QUALITY_GATE_TPU_5STYLE.json)
    M5 = [[0.0341, 0.0899, 0.0487, 0.0942, 0.0880],
          [0.0861, 0.0407, 0.0700, 0.0741, 0.0985],
          [0.0516, 0.0750, 0.0281, 0.0750, 0.0703],
          [0.0969, 0.0803, 0.0768, 0.0461, 0.0962],
          [0.0858, 0.0996, 0.0666, 0.0922, 0.0468]]
    SEP5 = [[0.0, 0.0765, 0.0335, 0.0832, 0.0767],
            [0.0765, 0.0, 0.0592, 0.0588, 0.0889],
            [0.0335, 0.0592, 0.0, 0.0620, 0.0564],
            [0.0832, 0.0588, 0.0620, 0.0, 0.0816],
            [0.0767, 0.0889, 0.0564, 0.0816, 0.0]]

    def test_recorded_runs_pass_at_default_alpha(self):
        from ml_music_style_transfer_tpu.testing import quality

        r = quality.discrimination_report(self.M5, self.SEP5)
        assert r["passed"] and all(r["per_style_discrimination"])
        # calibration anchor: this run's minimum normalized margin
        assert abs(r["min_normalized_margin"] - 0.351) < 0.005
        # 2-style committed run (QUALITY_GATE_TPU.json)
        m2 = [[0.0226, 0.0711], [0.0751, 0.0399]]
        sep2 = [[0.0, 0.062], [0.062, 0.0]]
        r2 = quality.discrimination_report(m2, sep2)
        assert r2["passed"]
        assert abs(r2["min_normalized_margin"] - 0.568) < 0.005

    def test_fixture_invariance_where_the_ratio_bar_drifted(self):
        """The failure mode that forced three recalibrations: the same model
        behavior on closer fixtures raises the raw own/best-other ratio above
        any fixed bar, while the normalized margin stays put. Model behavior
        here = 'own error 0.02, converts 60% of each pair's separation into
        margin'; only the fixture separation differs."""
        from ml_music_style_transfer_tpu.testing import quality

        def run_with_separation(sep):
            own = 0.02
            m = [[own, own + 0.6 * sep], [own + 0.6 * sep, own]]
            s = [[0.0, sep], [sep, 0.0]]
            return quality.discrimination_report(m, s), (m[0][0] / m[0][1])

        far, ratio_far = run_with_separation(0.10)
        near, ratio_near = run_with_separation(0.03)
        # the old criterion flips: ratio 0.25 (far) vs 0.53 (near) — a 0.5
        # bar would pass one and fail the other for identical model quality
        assert ratio_far < 0.5 < ratio_near
        # the normalized criterion is identical on both
        assert far["min_normalized_margin"] == near["min_normalized_margin"]
        assert far["passed"] and near["passed"]

    def test_non_discriminating_model_fails(self):
        from ml_music_style_transfer_tpu.testing import quality

        # well-separated fixtures, but the model's predictions don't prefer
        # their own target (margin ~0 regardless of separation)
        m = [[0.05, 0.052], [0.051, 0.05]]
        sep = [[0.0, 0.09], [0.09, 0.0]]
        r = quality.discrimination_report(m, sep)
        assert not r["passed"]
        assert r["min_normalized_margin"] < 0.05

    def test_wrong_argmin_always_fails(self):
        from ml_music_style_transfer_tpu.testing import quality

        # prediction conditioned on style 0 is CLOSER to target 1: negative
        # margin must fail at any alpha > 0
        m = [[0.06, 0.04], [0.07, 0.03]]
        sep = [[0.0, 0.05], [0.05, 0.0]]
        r = quality.discrimination_report(m, sep, alpha=0.01)
        assert not r["passed"]
        assert not r["per_style_discrimination"][0]
        assert r["per_style_discrimination"][1]

    def test_zero_separation_fails_loudly(self):
        from ml_music_style_transfer_tpu.testing import quality

        # indistinguishable fixtures are a broken gate, not a pass
        m = [[0.02, 0.03], [0.03, 0.02]]
        sep = [[0.0, 0.0], [0.0, 0.0]]
        r = quality.discrimination_report(m, sep)
        assert not r["passed"]
        assert r["normalized_margins"][0][1] is None  # -inf -> null in JSON

    def test_shape_validation(self):
        from ml_music_style_transfer_tpu.testing import quality

        with pytest.raises(ValueError):
            quality.normalized_margins([[0.0, 1.0]], [[0.0, 1.0]])
        with pytest.raises(ValueError):
            quality.normalized_margins([[0.0, 1.0], [1.0, 0.0]],
                                       [[0.0], [1.0]])


class TestStyleSeparability:
    def test_all_style_pairs_separable_in_spectrogram(self):
        """Every pair of synthetic styles must be separated in log-power
        spectrogram L1 by clearly more than a trained model's own-prediction
        error floor (~0.02 at the TPU gate's scale). The first round-3
        5-style TPU gate failed because aliciakeys/cuba/upright were all
        monotonic harmonic rolloffs whose mutual target distance sat AT that
        floor — the gate was measuring fixture similarity, not model
        discrimination. STYLE_FEATURES (odd-harmonic comb, tremolo + tine
        bell, inharmonic stretch + unison detune) restores pairwise margin;
        this pins it."""
        from ml_music_style_transfer_tpu.ops import reference as refops

        rng = np.random.default_rng(8)
        notes = synthetic.random_song(rng, duration=8.0)
        specs = {}
        for style in synthetic.STYLE_TIMBRES:
            y = synthetic.render_notes(notes, style, 44100, 8.0, normalize="rms")
            specs[style] = refops.log_power(refops.stft(y, 2048, 256))
        names = list(specs)
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                d = float(np.mean(np.abs(specs[a] - specs[b])))
                assert d > 0.025, (a, b, d)


@pytest.mark.slow
class TestLoudnessBalance:
    def test_rms_normalized_styles_equal_loudness(self):
        """normalize='rms' renders all styles at the same RMS (round-2
        verdict #5: the TPU gate's discrimination directions must face the
        same bar; peak normalization left ~3x RMS spread)."""
        rng = np.random.default_rng(4)
        notes = synthetic.random_song(rng, duration=10.0)
        rms = {}
        for style in synthetic.STYLE_TIMBRES:
            y = synthetic.render_notes(notes, style, 44100, 10.0,
                                       normalize="rms")
            rms[style] = float(np.sqrt(np.mean(y ** 2)))
            assert np.abs(y).max() <= 0.99 + 1e-6  # 16-bit writer safe
        vals = np.array(list(rms.values()))
        assert vals.max() / vals.min() < 1.02, rms
        # default stays the round-1/2 peak behavior
        y_peak = synthetic.render_notes(notes, "harpsichord", 44100, 10.0)
        assert abs(float(np.abs(y_peak).max()) - 0.5) < 1e-6


class TestQualityGate:
    def test_training_converged(self, trained):
        _, _, _, _, _, losses = trained
        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert last < first * 0.5, (first, last)

    def test_conditioning_pathway_alive(self, trained):
        """Wiring guard: the output must respond to the conditioning input at
        init (a dead audio branch would pass every content test below)."""
        tr, _, init_params, ds, held, _ = trained
        roll = jnp.asarray(ds.pianoroll[held][None])
        onoff = jnp.asarray(ds.onoff[held][None])
        ca = jnp.asarray(ds.specs[ds.styles[0]][0][None])
        cb = jnp.asarray(ds.specs[ds.styles[1]][0][None])
        apply = jax.jit(lambda p, c: tr.model.apply(p, roll, c, onoff))
        pa = np.asarray(apply(init_params, ca))
        pb = np.asarray(apply(init_params, cb))
        scale = max(np.abs(pa).mean(), 1e-9)
        assert np.abs(pa - pb).mean() > 0.05 * scale

    def test_heldout_content_from_midi(self, trained):
        """Content comes from the MIDI: the held-out chunk's prediction from
        its OWN roll must be decisively closer to the held-out target than
        the model's prediction from a WRONG roll (another chunk's MIDI, same
        conditioning). Comparing two model outputs cancels the tiny model's
        systematic bias (blur, style-average) so note placement is the only
        difference — the content signal a CI-budget run reliably learns. A
        weaker absolute check (prediction closer to the target than to a
        half-rotated copy) is asserted per style too; the sharp full-capacity
        style bars live in scripts/quality_gate_tpu.py."""
        tr, params, _, ds, held, _ = trained
        apply = jax.jit(lambda p, m, o, c: tr.model.apply(p, m, c, o))
        roll = jnp.asarray(ds.pianoroll[held][None])
        onoff = jnp.asarray(ds.onoff[held][None])
        wrong = 0  # a train chunk's MIDI
        roll_w = jnp.asarray(ds.pianoroll[wrong][None])
        onoff_w = jnp.asarray(ds.onoff[wrong][None])
        owns, wrongs = [], []
        for style in ds.styles:
            cond = jnp.asarray(ds.specs[style][1][None])
            t = ds.specs[style][held]
            pred = np.asarray(apply(params, roll, onoff, cond))[0]
            pred_w = np.asarray(apply(params, roll_w, onoff_w, cond))[0]
            own = float(np.abs(pred - t).mean())
            wrong_midi = float(np.abs(pred_w - t).mean())
            assert own < wrong_midi, (style, own, wrong_midi)
            shifted = float(np.abs(pred - np.roll(t, t.shape[0] // 2, axis=0)).mean())
            assert own < shifted, (style, own, shifted)
            owns.append(own)
            wrongs.append(wrong_midi)
        # decisive in aggregate; per-style gaps vary with the style's loudness
        assert sum(owns) < 0.97 * sum(wrongs), (owns, wrongs)

    def test_predicted_spec_griffinlim_floor(self, trained):
        tr, params, _, ds, held, _ = trained
        roll = jnp.asarray(ds.pianoroll[held][None])
        onoff = jnp.asarray(ds.onoff[held][None])
        cond = jnp.asarray(ds.specs[ds.styles[1]][0][None])
        pred = np.asarray(tr.model.apply(params, roll, cond, onoff))[0]  # (860,1025)
        wav = np.asarray(jgl.griffinlim_from_log_power(
            jnp.asarray(pred.T), key=jax.random.PRNGKey(0), n_iter=60))
        assert np.all(np.isfinite(wav)) and np.abs(wav).max() > 0
        # re-analyze: magnitudes must stay spectrally close to the prediction
        mag_pred = np.sqrt(np.expm1(np.clip(pred.T, 0, 20)))
        got = np.asarray(jstft.log_power_stft(jnp.asarray(wav), 2048, 256))
        mag_got = np.sqrt(np.expm1(np.clip(got[:, : mag_pred.shape[1]], 0, 20)))
        rel = np.linalg.norm(mag_got - mag_pred) / max(np.linalg.norm(mag_pred), 1e-9)
        assert rel < 0.6, rel
