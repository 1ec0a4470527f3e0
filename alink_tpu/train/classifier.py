"""Training steps for single-input identification classifiers.

Reference: ``code/model.py:15-82`` (CustomModel) — ``fit`` with
EarlyStopping(min_delta=0.1, patience=5) and validation_split 0.2,
categorical cross-entropy, optional sample weights, and an
augmentation-generator variant (``trainWithAugmentation``,
model.py:41-61).  Same schedule machinery as the siamese trainer
(train/trainer.py), specialised to (x, y) batches.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from alink_tpu.train.losses import one_hot
from alink_tpu.train.trainer import (
    EpochLog,
    TrainState,
    _PlateauControl,
    adadelta,
)


def create_classifier_state(
    model,
    rng: jax.Array,
    example: jnp.ndarray,
    learning_rate: float = 1.0,
    tx: optax.GradientTransformation | None = None,
) -> TrainState:
    """TrainState for a model exposing ``logits(x, train=...)``."""
    params = model.init(rng, example)
    tx = tx if tx is not None else adadelta(learning_rate)

    def logits_fn(p, x, *, train=False, rngs=None):
        return model.apply(p, x, train=train, rngs=rngs, method="logits")

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        logits_fn=logits_fn,
    )


def categorical_crossentropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Keras categorical_crossentropy (model.py:114) from logits."""
    per_sample = -jnp.sum(targets * jax.nn.log_softmax(logits, axis=-1),
                          axis=-1)
    if sample_weight is not None:
        # Keras 2 weighted form: mean(loss * w) corrected for zero-weight
        # rows only (see losses.binary_crossentropy) — not /sum(w).
        nonzero = jnp.mean((sample_weight != 0).astype(jnp.float32))
        return jnp.mean(per_sample * sample_weight) / jnp.maximum(
            nonzero, 1e-7)
    return jnp.mean(per_sample)


@jax.jit
def classifier_train_step(
    state: TrainState,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    dropout_key: jax.Array,
    sample_weight: jnp.ndarray | None = None,
) -> tuple[TrainState, jnp.ndarray, jnp.ndarray]:
    def loss_fn(params):
        logits = state.logits_fn(params, x, train=True,
                                 rngs={"dropout": dropout_key})
        targets = one_hot(labels, logits.shape[-1])
        return categorical_crossentropy(logits, targets, sample_weight), logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return state.apply_gradients(grads), loss, acc


@jax.jit
def classifier_eval_step(state: TrainState, x: jnp.ndarray,
                         labels: jnp.ndarray):
    logits = state.logits_fn(state.params, x)
    targets = one_hot(labels, logits.shape[-1])
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return categorical_crossentropy(logits, targets), acc


def fit_classifier(
    state: TrainState,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    epochs: int,
    batch_size: int,
    key: jax.Array,
    validation_split: float = 0.2,
    augment_fn: Callable | None = None,
    log_fn=None,
) -> tuple[TrainState, list[EpochLog]]:
    """CustomModel.finetune/trainWithoutVal semantics (model.py:33-66):
    tail validation split, reshuffled epochs, early stop on val loss.
    ``augment_fn(key, batch) -> batch`` reproduces trainWithAugmentation's
    per-batch augmentation (model.py:41-61)."""
    n = labels.shape[0]
    if n == 0:
        # Same guard as trainer.fit: one empty-batch step would NaN the
        # params silently; Keras raises here too.
        raise ValueError("fit_classifier() called with zero examples")
    # Keras slices train first: split_at = int(n * (1 - split)) — the
    # same rounding as trainer.fit (a one-sample boundary difference
    # shifts validation losses and hence early-stop epochs).
    n_train = int(n * (1.0 - validation_split)) if validation_split else n
    if n_train == 0:
        n_train = n  # degenerate tiny fit: train on all rows, no val
    n_val = n - n_train
    tx_, ty = x[:n_train], labels[:n_train]
    vx, vy = x[n_train:], labels[n_train:]
    # Ceil: Keras trains the short remainder batch too (trainer.fit got
    # this fix; flooring silently drops up to batch_size-1 samples/epoch).
    steps = max(1, -(-n_train // batch_size))
    control = _PlateauControl()
    logs: list[EpochLog] = []
    for epoch in range(epochs):
        key, kperm = jax.random.split(key)
        perm = jax.random.permutation(kperm, n_train)
        # Device-side accumulation: one host fetch per epoch, not per step.
        tl = ta = jnp.float32(0.0)
        for s in range(steps):
            idx = perm[s * batch_size:(s + 1) * batch_size]
            key, kd = jax.random.split(key)
            bx = tx_[idx]
            if augment_fn is not None:
                key, ka = jax.random.split(key)
                bx = augment_fn(ka, bx)
            state, loss, acc = classifier_train_step(state, bx, ty[idx], kd)
            tl += loss
            ta += acc
        tl, ta = float(tl), float(ta)
        if n_val:
            vl, va = classifier_eval_step(state, vx, vy)
            vl, va = float(vl), float(va)
        else:
            vl, va = tl / steps, ta / steps
        log = EpochLog(epoch, tl / steps, ta / steps, vl, va,
                       state.learning_rate)
        logs.append(log)
        if log_fn:
            log_fn(log)
        state, stop = control.update(state, vl)
        if stop:
            break
    return state, logs
