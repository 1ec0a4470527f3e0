"""Tests for the training subsystem (train/ vs code/siamese.py:35-125)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu import train as T
from alink_tpu.models import SiameseHead, SmallRes
from alink_tpu.train.losses import (
    accuracy,
    binary_crossentropy,
    class_weights_from_labels,
    one_hot,
)

D = 64


def _toy_pairs(key, n):
    """Genuine pairs are near-duplicates; imposters are far apart."""
    kl, kd = jax.random.split(key)
    base = jax.random.normal(kl, (n, D))
    y = jax.random.bernoulli(kd, 0.5, (n,)).astype(jnp.int32)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n, D))
    right = jnp.where(y[:, None] == 1, base + 0.1 * noise, base + 2.0 * noise)
    return base, right, y


@pytest.fixture(scope="module")
def state():
    head = SiameseHead(dtype=jnp.float32)
    return T.create_train_state(
        head, jax.random.PRNGKey(0), jnp.zeros((2, D)), jnp.zeros((2, D))
    )


class TestLosses:
    def test_bce_matches_keras_formula(self):
        logits = jnp.array([[2.0, -1.0], [0.5, 0.5]])
        targets = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        p = jax.nn.softmax(logits, axis=-1)
        expected = float(
            np.mean(
                -np.mean(
                    targets * np.log(p) + (1 - targets) * np.log(1 - p),
                    axis=-1,
                )
            )
        )
        got = float(binary_crossentropy(logits, targets))
        assert abs(got - expected) < 1e-5

    def test_bce_equals_categorical_ce_for_two_classes(self):
        """For a 2-class softmax with one-hot targets the (1-y)log(1-p)
        terms mirror the y log p terms, so Keras BCE == categorical CE —
        the reference's 'binary_crossentropy' on a softmax pair
        (siamese.py:35) is ordinary CE in disguise."""
        logits = jnp.array([[2.0, -1.0]])
        targets = jnp.array([[1.0, 0.0]])
        cce = -jax.nn.log_softmax(logits)[0, 0]
        bce = binary_crossentropy(logits, targets)
        assert abs(float(cce) - float(bce)) < 1e-5

    def test_class_weights(self):
        """w_c = (N / count_c) / (w_0 + w_1) per siamese.py:95-98."""
        labels = jnp.array([1, 1, 1, 0])
        w = class_weights_from_labels(labels)
        w1, w0 = 4 / 3, 4 / 1
        scale = w0 + w1
        np.testing.assert_allclose(
            np.asarray(w), [w1 / scale] * 3 + [w0 / scale], rtol=1e-6
        )

    def test_class_weights_single_class_batch(self):
        """A single-class batch has no imbalance: every sample gets the
        balanced weight 0.5 (regression: the absent class's n/1 guard
        weight dominated the normaliser and shrank the present-class
        weights to ~1/(n+1), near-zeroing that step's gradient)."""
        for labels in (jnp.zeros(8, jnp.int32), jnp.ones(8, jnp.int32)):
            w = class_weights_from_labels(labels)
            np.testing.assert_allclose(np.asarray(w), 0.5, rtol=1e-6)

    def test_ensemble_learning_rate_property(self):
        """TrainState.learning_rate works on ensemble states whose
        vmapped opt_state stacks the injected LR to shape (E,)."""
        from alink_tpu.models import SiameseHead

        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        state = T.create_ensemble_state(
            head, jax.random.PRNGKey(0), 3,
            jnp.zeros((2, D)), jnp.zeros((2, D)), learning_rate=0.25)
        assert state.learning_rate == 0.25

    def test_weighted_loss_normalisation(self):
        """Keras 2 weighted form: mean(loss * w) / mean(w != 0) — the
        loss genuinely scales with uniform weights (training_utils.py's
        weighted_masked_objective), it is NOT renormalised by sum(w)."""
        logits = jnp.zeros((4, 2))
        targets = one_hot(jnp.array([0, 1, 0, 1]))
        unweighted = binary_crossentropy(logits, targets)
        # Uniform w=1 reduces to the unweighted mean.
        w1 = binary_crossentropy(logits, targets, jnp.ones(4))
        assert abs(float(unweighted) - float(w1)) < 1e-6
        # Uniform w=0.5 halves the loss (Keras scales, never renorms).
        w_half = binary_crossentropy(logits, targets, jnp.full(4, 0.5))
        assert abs(float(w_half) - 0.5 * float(unweighted)) < 1e-6
        # Zero-weight rows are excluded via the mean(w != 0) correction.
        w_mask = binary_crossentropy(logits, targets,
                                     jnp.array([1.0, 1.0, 0.0, 0.0]))
        assert abs(float(w_mask) - float(unweighted)) < 1e-6

    def test_accuracy(self):
        logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        targets = one_hot(jnp.array([0, 1, 1]))
        assert abs(float(accuracy(logits, targets)) - 2 / 3) < 1e-6


class TestTrainSteps:
    def test_train_step_reduces_loss(self, state):
        left, right, y = _toy_pairs(jax.random.PRNGKey(1), 128)
        st = state
        first = None
        for i in range(30):
            st, loss, _ = T.train_step(st, left, right, y,
                                       jax.random.PRNGKey(i))
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_eval_step_unweighted(self, state):
        left, right, y = _toy_pairs(jax.random.PRNGKey(2), 64)
        loss, acc = T.eval_step(state, left, right, y)
        assert loss.shape == ()
        assert 0.0 <= float(acc) <= 1.0


class TestFit:
    def test_fit_learns_and_logs(self, state):
        left, right, y = _toy_pairs(jax.random.PRNGKey(3), 512)
        st, logs = T.fit(state, left, right, y, epochs=5, batch_size=64,
                         key=jax.random.PRNGKey(4))
        assert logs[-1].val_acc > 0.8
        assert logs[0].learning_rate == 1.0

    def test_fit_single_pair_degenerate_split(self, state):
        """n=1 with validation_split=0.2: the Keras-exact split would
        put the only row in validation (int(1*0.8)=0 train rows) — the
        guard trains on all rows and skips validation instead of
        reshaping a zero-size batch (regression: existing_AL_MTP's
        1-pair oracle rounds)."""
        left, right, y = _toy_pairs(jax.random.PRNGKey(11), 1)
        st, logs = T.fit(state, left, right, y, epochs=2, batch_size=32,
                         key=jax.random.PRNGKey(12))
        assert len(logs) == 2
        assert np.isfinite(logs[-1].val_loss)

    def test_fit_zero_examples_raises(self, state):
        """n=0 would NaN-poison the state via a mean over an empty batch;
        it must raise instead (Keras does too)."""
        left, right, y = _toy_pairs(jax.random.PRNGKey(11), 1)
        with pytest.raises(ValueError, match="zero examples"):
            T.fit(state, left[:0], right[:0], y[:0], epochs=1,
                  batch_size=32, key=jax.random.PRNGKey(12))

    def test_early_stop_fires(self, state):
        """With patience 5 and min_delta 0.1, a flat val loss stops after
        5 stalled epochs (Keras checks wait >= patience after the
        increment: first epoch sets best, epochs 2-6 stall)."""
        left, right, y = _toy_pairs(jax.random.PRNGKey(5), 64)
        # Tiny LR so val loss never improves by > 0.1.
        st = state.with_learning_rate(1e-6)
        st, logs = T.fit(st, left, right, y, epochs=30, batch_size=32,
                         key=jax.random.PRNGKey(6))
        assert len(logs) <= 7  # <= 1 best epoch + patience 5 (+ slack 1)

    def test_early_stop_not_starved_by_small_improvements(self, state):
        """Keras EarlyStopping moves its best only on > min_delta
        improvements, so steady sub-min_delta creep STILL stops; but a
        genuine > min_delta improvement must reset the counter.  Guards
        the separate-best fix (a shared any-improvement best would stop
        a run whose loss drops 0.05/epoch forever)."""
        from alink_tpu.train.trainer import _PlateauControl

        # 0.05/epoch creep: each step is < min_delta, but the CUMULATIVE
        # improvement crosses min_delta every couple of epochs because
        # Keras's best only moves on > min_delta steps — so the wait
        # counter keeps resetting and training never stops.  (A shared
        # any-improvement best would creep along with the loss and stop
        # at epoch ~5 despite steady progress.)
        ctl = _PlateauControl(min_delta=0.1, es_patience=5)
        loss, stopped = 10.0, False
        for _ in range(20):
            loss -= 0.05
            state, stop = ctl.update(state, loss)
            stopped = stopped or stop
        assert not stopped
        # Truly flat loss still stops after exactly `patience` stalls.
        ctl2 = _PlateauControl(min_delta=0.1, es_patience=3)
        stops = [ctl2.update(state, 5.0)[1] for _ in range(5)]
        assert stops == [False, False, False, True, True]

    def test_plateau_reduces_lr(self, state):
        left, right, y = _toy_pairs(jax.random.PRNGKey(7), 64)
        st = state.with_learning_rate(1e-6)
        st, logs = T.fit(st, left, right, y, epochs=30, batch_size=32,
                         key=jax.random.PRNGKey(8))
        # ReduceLROnPlateau(factor=.2) fired at least once before early stop.
        assert logs[-1].learning_rate < 1e-6 or len(logs) < 8


class TestCustomTrain:
    def test_generator_loop(self, state):
        def gen():
            k = jax.random.PRNGKey(9)
            while True:
                k, kk = jax.random.split(k)
                ll, rr, yy = _toy_pairs(kk, 64)
                yield (ll, rr), yy

        st, logs = T.custom_train(
            state, gen(), epochs=2, batch_size=64,
            key=jax.random.PRNGKey(10), n_steps=64 * 30,
        )
        assert logs[-1].train_acc > 0.75
        assert logs[-1].val_loss > 0.0


class TestSmallResTraining:
    @pytest.mark.slow
    def test_dropout_rng_threads(self):
        model = SmallRes(feature_dim=32, dtype=jnp.float32)
        st = T.create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((2, 24, 24, 3)), jnp.zeros((2, 24, 24, 3)),
        )
        left = jax.random.uniform(jax.random.PRNGKey(1), (8, 24, 24, 3))
        right = jax.random.uniform(jax.random.PRNGKey(2), (8, 24, 24, 3))
        y = jnp.arange(8) % 2
        st, loss, acc = T.train_step(st, left, right, y, jax.random.PRNGKey(3))
        assert jnp.isfinite(loss)


class TestCheckpoint:
    def test_roundtrip_and_maybe_restore(self, state, tmp_path):
        p = os.path.join(tmp_path, "ck")
        T.save(p, state.params)
        restored, ok = T.maybe_restore(p, state.params)
        assert ok
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )
        _, ok2 = T.maybe_restore(p + "_missing", state.params)
        assert not ok2


def test_test_accuracy_matches_definition(state):
    feats = jax.random.normal(jax.random.PRNGKey(11), (10, D))
    labels = jnp.arange(10) % 3
    acc = T.test_accuracy(state, feats, labels)
    from alink_tpu.ops.pairwise import score_matrix_xla

    scores = score_matrix_xla(state.params, feats, feats)
    pred = np.asarray(scores) > 0.5
    same = np.asarray(labels)[:, None] == np.asarray(labels)[None, :]
    assert abs(acc - float(np.mean(pred == same))) < 1e-6


class TestEnsembleTraining:
    @pytest.mark.slow
    def test_vmapped_members_learn_independently(self):
        head = SiameseHead(widths=(16, 8), dtype=jnp.float32)
        e = 3
        state = T.create_ensemble_state(
            head, jax.random.PRNGKey(0), e,
            jnp.zeros((2, D)), jnp.zeros((2, D)), learning_rate=1.0,
        )
        # Member params differ at init (check a kernel leaf; biases are
        # zero-initialised for every member).
        kernel = [x for x in jax.tree.leaves(state.params) if x.ndim >= 3][0]
        assert kernel.shape[0] == e
        assert not np.allclose(np.asarray(kernel[0]), np.asarray(kernel[1]))

        def gen():
            k = jax.random.PRNGKey(1)
            while True:
                k, kk = jax.random.split(k)
                l, r, y = _toy_pairs(kk, 64)
                yield (l, r), y

        state2, logs = T.train_ensemble(state, gen(), epochs=2,
                                        batch_size=64, n_steps=64 * 20)
        assert len(logs) == 2
        # Every member's accuracy improved over epoch 1 -> 2 on average.
        assert np.mean(logs[-1]["acc"]) > 0.7

        # The trained stacked params slot directly into a Committee.
        from alink_tpu.active import Committee

        com = Committee(head, state2.params)
        l, r, y = _toy_pairs(jax.random.PRNGKey(2), 32)
        probs = com.predict(l, r)
        acc = np.mean(np.argmax(np.asarray(probs), -1) == np.asarray(y))
        assert acc > 0.7

    def test_dropout_members_train_with_dropout(self):
        """ensemble_train_step must thread train=True + per-member dropout
        keys into dropout-bearing members (regression: the step trained
        every member deterministically, silently skipping dropout)."""
        import flax.linen as nn

        class DropHead(nn.Module):
            @nn.compact
            def logits(self, left, right, *, train=False):
                x = jnp.abs(left - right)
                x = nn.Dense(8)(x)
                x = nn.Dropout(0.5, deterministic=not train)(x)
                return nn.Dense(2)(x)

            def __call__(self, left, right, *, train=False, rngs=None):
                return jax.nn.softmax(
                    self.logits(left, right, train=train), axis=-1)

        state = T.create_ensemble_state(
            DropHead(), jax.random.PRNGKey(0), 2,
            jnp.zeros((2, D)), jnp.zeros((2, D)),
        )
        l, r, y = _toy_pairs(jax.random.PRNGKey(1), 16)
        batch = (jnp.stack([l, l]), jnp.stack([r, r]), jnp.stack([y, y]))
        s_a, _, _ = T.ensemble_train_step(state, *batch,
                                          key=jax.random.PRNGKey(7))
        s_b, _, _ = T.ensemble_train_step(state, *batch,
                                          key=jax.random.PRNGKey(8))
        s_a2, _, _ = T.ensemble_train_step(state, *batch,
                                           key=jax.random.PRNGKey(7))
        ka = jax.tree.leaves(s_a.params)[0]
        kb = jax.tree.leaves(s_b.params)[0]
        ka2 = jax.tree.leaves(s_a2.params)[0]
        # Different dropout keys -> different gradients; same key -> same.
        assert not np.allclose(np.asarray(ka), np.asarray(kb))
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(ka2))

    @pytest.mark.slow
    def test_per_member_batches(self):
        """Members receive different batches (bagging effect preserved)."""
        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        state = T.create_ensemble_state(
            head, jax.random.PRNGKey(0), 2,
            jnp.zeros((2, D)), jnp.zeros((2, D)),
        )
        seen = []

        def gen():
            k = jax.random.PRNGKey(3)
            i = 0
            while True:
                k, kk = jax.random.split(k)
                l, r, y = _toy_pairs(kk, 16)
                seen.append(i)
                i += 1
                yield (l, r), y

        T.train_ensemble(state, gen(), epochs=1, batch_size=16,
                         n_steps=16 * 2)
        # 2 steps x 2 members = 4 draws from the shared stream.
        assert len(seen) == 4
