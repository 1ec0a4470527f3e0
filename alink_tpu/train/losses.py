"""Loss and metric functions with exact reference (Keras) semantics.

The reference compiles every siamese model with
``loss="binary_crossentropy"`` over a **2-class softmax** output and one-hot
targets (``code/siamese.py:35``, ``:103``).  Keras' binary crossentropy on a
2-vector averages the per-class BCE terms:

    loss = -mean_c [ y_c log p_c + (1 - y_c) log(1 - p_c) ]

which is *not* categorical cross-entropy (it adds the (1-y) log(1-p) terms).
For a 2-class softmax the two are monotonically related but numerically
different; we reproduce the Keras form so loss curves and the plateau/early-
stop thresholds (min_delta=0.1, ``siamese.py:45``) transfer 1:1.

Class weighting follows ``customTrainModel`` (``siamese.py:95-98``): weights
inversely proportional to each class's batch frequency, normalised to sum
to 1, applied per sample by its true class (Keras class_weight semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7  # Keras backend epsilon


def binary_crossentropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Keras binary_crossentropy over softmax(logits) vs one-hot targets.

    Args:
        logits: (N, 2) pre-softmax outputs (SiameseHead.logits).
        targets: (N, 2) one-hot labels.
        sample_weight: optional (N,) per-sample weights (class_weight path).

    Returns scalar mean loss.
    """
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    bce = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    per_sample = jnp.mean(bce, axis=-1)
    if sample_weight is not None:
        # Keras 2's weighted_masked_objective (training_utils.py):
        #   score_array *= weights
        #   score_array /= K.mean(K.cast(K.not_equal(weights, 0), floatx))
        #   return K.mean(score_array)
        # i.e. mean(loss * w) over the batch, corrected only for
        # zero-weight rows — NOT sum(loss*w)/sum(w), which rescales the
        # loss by mean(w) (~2x with the reference's sum-to-1 class
        # weights) and would shift every loss curve and plateau check.
        per_sample = per_sample * sample_weight
        nonzero = jnp.mean((sample_weight != 0).astype(jnp.float32))
        return jnp.mean(per_sample) / jnp.maximum(nonzero, _EPS)
    return jnp.mean(per_sample)


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Keras 'accuracy' metric: argmax agreement with one-hot targets."""
    return jnp.mean(
        (jnp.argmax(logits, axis=-1) == jnp.argmax(targets, axis=-1)).astype(
            jnp.float32
        )
    )


def class_weights_from_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample weights from batch class balance (siamese.py:95-98).

    ``labels``: (N,) int {0, 1}.  w_c = (N / count_c) / (w_0 + w_1); each
    sample gets the weight of its class.  jit-safe (no host round trip).
    """
    n = labels.shape[0]
    n1 = jnp.sum(labels == 1)
    n0 = n - n1
    w1 = n / jnp.maximum(n1, 1).astype(jnp.float32)
    w0 = n / jnp.maximum(n0, 1).astype(jnp.float32)
    # A single-class batch has no imbalance to correct: treat the absent
    # class as if balanced (its n/1 = n guard weight would otherwise
    # dominate the normaliser and shrink every present-class weight to
    # ~1/(n+1), silently near-zeroing that step's gradient).
    w1 = jnp.where(n1 > 0, w1, w0)
    w0 = jnp.where(n0 > 0, w0, w1)
    scale = w0 + w1
    return jnp.where(labels == 1, w1 / scale, w0 / scale)


def one_hot(labels: jnp.ndarray, num_classes: int = 2) -> jnp.ndarray:
    """to_categorical (code/helpers.py:33-36, keras.utils.to_categorical)."""
    return jax.nn.one_hot(labels, num_classes)
