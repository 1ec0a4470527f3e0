"""Jit'd training steps + host-side epoch control with Keras semantics.

Reference: ``code/siamese.py:44-112``.

- optimizer: ``Adadelta(learningRate)`` (``siamese.py:35``; Keras defaults
  rho=0.95, eps=1e-8, lr=1.0) — here ``optax.adadelta`` wrapped in
  ``inject_hyperparams`` so ReduceLROnPlateau can rescale the live learning
  rate without rebuilding the optimizer state;
- ``fit``           — Keras ``model.fit`` semantics used by ``finetune``
  (``siamese.py:52-58``): validation split from the *tail* of the data
  (Keras slices before shuffling), EarlyStopping(min_delta=0.1, patience=5)
  and ReduceLROnPlateau(factor=0.2, patience=5, min_lr=0.01) on val_loss;
- ``custom_train``  — ``customTrainModel`` (``siamese.py:81-112``): per-batch
  random train/val split, batch-balance class weights, running epoch means;
- ``train_step`` / ``eval_step`` — single fused device steps (grad + update,
  loss + acc), batch-shardable under a mesh.  State is NOT donated: the
  trained heads are KB-MB scale (the big backbones are frozen), so the
  transient second copy is cheap, and donation would delete a caller's
  input state (breaking before/after comparisons and retries).

TPU-first departures: the whole epoch's micro-batches run through one
compiled step function (no per-call graph rebuild); dropout is stateless
(keys threaded); LR control is a host decision between epochs (cheap) while
every gradient step stays on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from alink_tpu.train.losses import (
    accuracy,
    binary_crossentropy,
    class_weights_from_labels,
    one_hot,
)


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + optimizer + step)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    logits_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    @property
    def learning_rate(self) -> float:
        lr = jnp.asarray(self.opt_state.hyperparams["learning_rate"])
        # Ensemble states (create_ensemble_state) stack the injected LR
        # to shape (E,); members share the value, so return the first —
        # a bare float() would raise on the stacked array.
        return float(lr.reshape(-1)[0])

    def with_learning_rate(self, lr: float) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


def adadelta(learning_rate: float = 1.0) -> optax.GradientTransformation:
    """Keras-default Adadelta (siamese.py:35) with a live-tunable LR."""
    return optax.inject_hyperparams(optax.adadelta)(
        learning_rate=learning_rate, rho=0.95, eps=1e-8
    )


def create_train_state(
    model,
    rng: jax.Array,
    example_left: jnp.ndarray,
    example_right: jnp.ndarray,
    learning_rate: float = 1.0,
    tx: optax.GradientTransformation | None = None,
) -> TrainState:
    """Initialise params + Adadelta state for a siamese model.

    ``model`` must expose a ``logits`` method (SiameseHead / SmallRes do).
    """
    params = model.init(rng, example_left, example_right)
    tx = tx if tx is not None else adadelta(learning_rate)

    def logits_fn(p, left, right, *, train=False, rngs=None):
        return model.apply(p, left, right, train=train, rngs=rngs,
                           method="logits") if _takes_train(model) else \
            model.apply(p, left, right, method="logits")

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        logits_fn=logits_fn,
    )


def _takes_train(model) -> bool:
    import inspect

    try:
        return "train" in inspect.signature(model.logits).parameters
    except (TypeError, ValueError):
        return False


@partial(jax.jit, static_argnames=("weighted",))
def train_step(
    state: TrainState,
    left: jnp.ndarray,
    right: jnp.ndarray,
    labels: jnp.ndarray,
    dropout_key: jax.Array,
    weighted: bool = True,
) -> tuple[TrainState, jnp.ndarray, jnp.ndarray]:
    """One fused gradient step.  ``labels``: (N,) int.

    Returns (new_state, loss, accuracy).  ``weighted=True`` applies the
    customTrainModel class weighting (siamese.py:95-98); finetune's
    ``model.fit`` path uses ``weighted=False`` (siamese.py:57 passes none).
    """
    targets = one_hot(labels)
    sw = class_weights_from_labels(labels) if weighted else None

    def loss_fn(params):
        logits = state.logits_fn(params, left, right, train=True,
                                 rngs={"dropout": dropout_key})
        return binary_crossentropy(logits, targets, sw), logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return state.apply_gradients(grads), loss, accuracy(logits, targets)


@jax.jit
def eval_step(
    state: TrainState,
    left: jnp.ndarray,
    right: jnp.ndarray,
    labels: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unweighted val loss + accuracy (test_on_batch, siamese.py:105-107)."""
    targets = one_hot(labels)
    logits = state.logits_fn(state.params, left, right)
    return binary_crossentropy(logits, targets), accuracy(logits, targets)


class EpochLog(NamedTuple):
    epoch: int
    train_loss: float
    train_acc: float
    val_loss: float
    val_acc: float
    learning_rate: float


@dataclasses.dataclass
class _PlateauControl:
    """EarlyStopping + ReduceLROnPlateau on val_loss (siamese.py:45-46).

    Keras semantics: EarlyStopping counts epochs where val_loss fails to
    improve by more than ``min_delta``; ReduceLROnPlateau rescales LR by
    ``factor`` after ``patience`` stalled epochs, floored at ``min_lr``.
    """

    min_delta: float = 0.1
    es_patience: int = 5
    lr_patience: int = 5
    factor: float = 0.2
    min_lr: float = 0.01

    # Each callback keeps its OWN best (Keras instantiates them
    # separately): EarlyStopping only moves its best on a > min_delta
    # improvement — a shared any-improvement best would let sub-min_delta
    # creep starve the wait reset and stop a still-improving run.
    best_es: float = float("inf")
    best_lr: float = float("inf")
    es_wait: int = 0
    lr_wait: int = 0
    _LR_MIN_DELTA = 1e-4  # Keras ReduceLROnPlateau default

    def update(self, state: TrainState, val_loss: float
               ) -> tuple[TrainState, bool]:
        if val_loss < self.best_es - self.min_delta:
            self.best_es = val_loss
            self.es_wait = 0
        else:
            self.es_wait += 1
        if val_loss < self.best_lr - self._LR_MIN_DELTA:
            self.best_lr = val_loss
            self.lr_wait = 0
        else:
            self.lr_wait += 1
            # Keras fires at wait >= patience (checked after increment).
            if self.lr_wait >= self.lr_patience:
                new_lr = max(state.learning_rate * self.factor, self.min_lr)
                if new_lr < state.learning_rate:
                    state = state.with_learning_rate(new_lr)
                self.lr_wait = 0
        stop = self.es_wait >= self.es_patience
        return state, stop


def fit(
    state: TrainState,
    left: jnp.ndarray,
    right: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    epochs: int,
    batch_size: int,
    key: jax.Array,
    validation_split: float = 0.2,
    weighted: bool = False,
    log_fn: Callable[[EpochLog], None] | None = None,
) -> tuple[TrainState, list[EpochLog]]:
    """Keras ``model.fit`` semantics for ``finetune`` (siamese.py:52-58).

    Validation data = the tail ``validation_split`` fraction (Keras slices
    before shuffling); training batches reshuffle every epoch; early-stop /
    plateau-LR exactly as the reference callbacks.
    """
    n = labels.shape[0]
    if n == 0:
        # A zero-example fit would run one step on an empty batch whose
        # mean-loss is NaN and silently poison every parameter; Keras
        # raises here too.
        raise ValueError("fit() called with zero examples")
    # Keras slices train first: split_at = int(n * (1 - split)).
    n_train = int(n * (1.0 - validation_split)) if validation_split else n
    if n_train == 0:
        # Degenerate tiny fit (n*split rounds to everything-validation):
        # Keras would raise on an empty train set; train on all rows and
        # skip validation instead — the callers here feed arbitrarily
        # small query batches (e.g. a 1-pair oracle round).
        n_train = n
    n_val = n - n_train
    tl, tr, ty = left[:n_train], right[:n_train], labels[:n_train]
    vl, vr, vy = left[n_train:], right[n_train:], labels[n_train:]
    # Ceil: Keras trains on the short remainder batch too (one extra
    # compile for that shape; dropping it would skip up to batch_size-1
    # samples per epoch).
    steps = max(1, -(-n_train // batch_size))
    control = _PlateauControl()
    logs: list[EpochLog] = []

    for epoch in range(epochs):
        key, kperm = jax.random.split(key)
        perm = jax.random.permutation(kperm, n_train)
        # Metrics accumulate on device; one host fetch per epoch (a
        # per-step float() costs a full host round trip on remote devices).
        tloss = tacc = jnp.float32(0.0)
        for s in range(steps):
            idx = perm[s * batch_size:(s + 1) * batch_size]
            key, kd = jax.random.split(key)
            state, loss, acc = train_step(
                state, tl[idx], tr[idx], ty[idx], kd, weighted=weighted
            )
            tloss += loss
            tacc += acc
        tloss, tacc = float(tloss), float(tacc)
        if n_val:
            vloss, vacc = eval_step(state, vl, vr, vy)
            vloss, vacc = float(vloss), float(vacc)
        else:
            vloss, vacc = tloss / steps, tacc / steps
        log = EpochLog(epoch, tloss / steps, tacc / steps, vloss, vacc,
                       state.learning_rate)
        logs.append(log)
        if log_fn:
            log_fn(log)
        state, stop = control.update(state, vloss)
        if stop:
            break
    return state, logs


def custom_train(
    state: TrainState,
    data_iter: Iterator[tuple[tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]],
    *,
    epochs: int,
    batch_size: int,
    key: jax.Array,
    val_ratio: float = 0.2,
    n_steps: int = 320000,
    preprocess: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    log_fn: Callable[[EpochLog], None] | None = None,
) -> tuple[TrainState, list[EpochLog]]:
    """``customTrainModel`` (siamese.py:81-112): generator-driven epochs.

    Per batch: random ``val_ratio`` split, class-weighted train step on the
    rest, unweighted eval on the held-out part, running epoch means.
    """
    steps_per_epoch = int(n_steps / batch_size)
    logs: list[EpochLog] = []
    for eno in range(epochs):
        tloss = tacc = vloss = vacc = jnp.float32(0.0)
        for _ in range(steps_per_epoch):
            (xl, xr), y = next(data_iter)
            if preprocess is not None:
                xl, xr = preprocess(xl), preprocess(xr)
            xl, xr, y = jnp.asarray(xl), jnp.asarray(xr), jnp.asarray(y)
            key, kperm, kd = jax.random.split(key, 3)
            perm = jax.random.permutation(kperm, y.shape[0])
            split = int(y.shape[0] * val_ratio)
            tr_idx, va_idx = perm[split:], perm[:split]
            state, loss, acc = train_step(
                state, xl[tr_idx], xr[tr_idx], y[tr_idx], kd, weighted=True
            )
            tloss += loss
            tacc += acc
            if split:
                vl, va = eval_step(state, xl[va_idx], xr[va_idx], y[va_idx])
                vloss += vl
                vacc += va
        log = EpochLog(eno, float(tloss) / steps_per_epoch,
                       float(tacc) / steps_per_epoch,
                       float(vloss) / steps_per_epoch,
                       float(vacc) / steps_per_epoch,
                       state.learning_rate)
        logs.append(log)
        if log_fn:
            log_fn(log)
    return state, logs


def test_accuracy(
    state: TrainState,
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    batch_size: int = 512,
) -> float:
    """All-pairs verification accuracy (``testAccuracy``, siamese.py:60-79).

    The reference builds every (i, j) pair in Python and predicts in chunks;
    here it is one blocked score-matrix pass compared against the label
    outer product.  ``batch_size`` is kept for signature parity but the
    computation is one device pass.
    """
    from alink_tpu.ops.pairwise import score_matrix

    del batch_size
    # SiameseHead params live inside the TrainState params tree.  The
    # dispatcher picks the fused Pallas kernel on TPU (ops/pairwise.py)
    # and falls back to the blocked XLA path elsewhere.
    scores = score_matrix(state.params, feats, feats)
    pred = (scores > 0.5).astype(jnp.int32)
    same = (labels[:, None] == labels[None, :]).astype(jnp.int32)
    return float(jnp.mean((pred == same).astype(jnp.float32)))
