"""Tests for classification models + trainer (models/classify.py,
train/classifier.py vs code/model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu import train as T
from alink_tpu.models import (
    ResNet50Classifier,
    SENet50Classifier,
    SmallResClassifier,
    VGG16Classifier,
)


class TestTopologies:
    @pytest.mark.parametrize("factory,size", [
        (lambda: ResNet50Classifier(7, dtype=jnp.float32), 32),
        (lambda: SENet50Classifier(7, dtype=jnp.float32), 32),
        (lambda: VGG16Classifier(7, hid_dim=16, dtype=jnp.float32), 32),
        (lambda: SmallResClassifier(7, dtype=jnp.float32), 16),
    ])
    def test_forward_shapes(self, factory, size):
        model = factory()
        x = jnp.zeros((2, size, size, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        probs = model.apply(params, x)
        assert probs.shape == (2, 7)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
        logits = model.apply(params, x, method="logits")
        assert logits.shape == (2, 7)


class TestClassifierTraining:
    @pytest.mark.slow
    def test_fit_learns(self):
        model = SmallResClassifier(3, dtype=jnp.float32)
        state = T.create_classifier_state(
            model, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
        )
        rng = np.random.default_rng(0)
        n = 192
        labels = rng.integers(0, 3, n)
        # Class-separable images: mean brightness encodes the class.
        x = (labels[:, None, None, None] * 60.0 + 40.0
             + rng.normal(0, 5.0, (n, 16, 16, 3))).astype(np.float32)
        state, logs = T.fit_classifier(
            state, jnp.asarray(x), jnp.asarray(labels),
            epochs=8, batch_size=32, key=jax.random.PRNGKey(1),
        )
        assert logs[-1].val_acc > 0.6

    def test_categorical_ce_matches_definition(self):
        logits = jnp.array([[2.0, 0.0, -1.0]])
        targets = jnp.array([[0.0, 1.0, 0.0]])
        got = float(T.categorical_crossentropy(logits, targets))
        want = -float(jax.nn.log_softmax(logits)[0, 1])
        assert abs(got - want) < 1e-6

    def test_sample_weights(self):
        logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
        targets = jnp.eye(2)
        uniform = T.categorical_crossentropy(logits, targets,
                                             jnp.array([1.0, 1.0]))
        plain = T.categorical_crossentropy(logits, targets)
        assert abs(float(uniform) - float(plain)) < 1e-6

    def test_augment_hook_called(self):
        model = SmallResClassifier(2, dtype=jnp.float32)
        state = T.create_classifier_state(
            model, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
        )
        calls = []

        def augment(key, batch):
            calls.append(batch.shape)
            return batch

        x = jnp.zeros((20, 16, 16, 3))
        y = jnp.zeros(20, jnp.int32)
        T.fit_classifier(state, x, y, epochs=1, batch_size=8,
                         key=jax.random.PRNGKey(1), augment_fn=augment)
        assert len(calls) >= 1
