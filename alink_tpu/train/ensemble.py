"""Vmapped ensemble training: the whole committee in one program.

Reference: the drivers train committee members one after another through
the same generator (``ALINK.py:122-132`` — a Python loop of
``customTrainModel`` calls, each a full pass of host->GPU round trips).
Here the E members' params and optimizer states carry a leading ensemble
axis and every training step is ONE vmapped/jit'd program: each member
sees its own batch (drawn from the shared stream, preserving the
sequential scheme's "different batches per member" bagging effect) and its
own dropout key.  This is the committee-parallel layout SURVEY.md
section 2.4 prescribes; on a mesh the ensemble axis shards over ``model``.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp

from alink_tpu.train.losses import (
    accuracy,
    binary_crossentropy,
    class_weights_from_labels,
    one_hot,
)
from alink_tpu.train.trainer import TrainState, _takes_train, adadelta


def create_ensemble_state(
    model,
    rng: jax.Array,
    num_members: int,
    example_left: jnp.ndarray,
    example_right: jnp.ndarray,
    learning_rate: float = 0.1,
) -> TrainState:
    """TrainState whose params/opt_state carry a leading ensemble axis E.

    Members are independently initialised (the reference's per-member
    Keras inits, ALINK.py:94-96).
    """
    keys = jax.random.split(rng, num_members)
    params = jax.vmap(lambda k: model.init(k, example_left, example_right))(
        keys)
    tx = adadelta(learning_rate)
    opt_state = jax.vmap(tx.init)(params)

    def logits_fn(p, left, right, *, train=False, rngs=None):
        # Forward train/rngs so dropout-bearing members actually train
        # with dropout (the docstring promises per-member keys; SiameseHead
        # has no dropout, but e.g. SmallRes members do).
        if train and _takes_train(model):
            return model.apply(p, left, right, train=True, rngs=rngs,
                               method="logits")
        return model.apply(p, left, right, method="logits")

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        tx=tx,
        logits_fn=logits_fn,
    )


@partial(jax.jit, static_argnames=("weighted",))
def ensemble_train_step(
    state: TrainState,
    left: jnp.ndarray,
    right: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    key: jax.Array | None = None,
    weighted: bool = True,
) -> tuple[TrainState, jnp.ndarray, jnp.ndarray]:
    """One vmapped gradient step for all members.

    ``left``/``right``: (E, B, D); ``labels``: (E, B) — member m trains on
    its own batch m.  ``key`` seeds per-member dropout (split across the
    ensemble axis); omitted, it derives deterministically from
    ``state.step`` so dropout-bearing members still regularise.  Returns
    per-member (loss, acc) of shape (E,).
    """
    if key is None:
        key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
    e = jax.tree.leaves(state.params)[0].shape[0]
    member_keys = jax.random.split(key, e)

    def member_step(params, opt_state, le, r, y, mkey):
        targets = one_hot(y)
        sw = class_weights_from_labels(y) if weighted else None

        def loss_fn(p):
            # train=True + a per-member dropout key: logits_fn forwards
            # them only when the member model actually takes them
            # (create_ensemble_state), so dropout-free heads are
            # unaffected while e.g. SmallRes members train regularised.
            logits = state.logits_fn(p, le, r, train=True,
                                     rngs={"dropout": mkey})
            return binary_crossentropy(logits, targets, sw), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, new_opt = state.tx.update(grads, opt_state, params)
        import optax

        return (optax.apply_updates(params, updates), new_opt, loss,
                accuracy(logits, targets))

    params, opt_state, losses, accs = jax.vmap(member_step)(
        state.params, state.opt_state, left, right, labels, member_keys)
    return (
        state.replace(step=state.step + 1, params=params,
                      opt_state=opt_state),
        losses,
        accs,
    )


def train_ensemble(
    state: TrainState,
    data_iter: Iterator,
    *,
    epochs: int,
    batch_size: int,
    n_steps: int = 320000,
    key: jax.Array | None = None,
) -> tuple[TrainState, list]:
    """customTrainModel-style epochs for the whole committee at once.

    Per step, E batches are drawn from the shared stream and stacked — the
    same data budget as the reference's sequential member loop, E times
    fewer program launches.  ``key`` seeds dropout for dropout-bearing
    members (folded per step); omitted, each step derives its key from
    ``state.step`` (see ensemble_train_step).
    """
    e = jax.tree.leaves(state.params)[0].shape[0]
    steps_per_epoch = int(n_steps / batch_size)
    logs = []
    for _ in range(epochs):
        tl = ta = jnp.zeros((e,), jnp.float32)
        for _ in range(steps_per_epoch):
            ls, rs, ys = [], [], []
            for _ in range(e):
                (xl, xr), y = next(data_iter)
                ls.append(xl)
                rs.append(xr)
                ys.append(y)
            step_key = (None if key is None
                        else jax.random.fold_in(key, state.step))
            state, loss, acc = ensemble_train_step(
                state,
                jnp.stack([jnp.asarray(x) for x in ls]),
                jnp.stack([jnp.asarray(x) for x in rs]),
                jnp.stack([jnp.asarray(x) for x in ys]),
                key=step_key,
            )
            tl = tl + loss
            ta = ta + acc
        logs.append({
            "loss": (tl / steps_per_epoch).tolist(),
            "acc": (ta / steps_per_epoch).tolist(),
        })
    return state, logs
