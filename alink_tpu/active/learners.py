"""Estimator-agnostic active learners over TrainStates.

Reference: the modAL fork in ``code/base.py`` (BaseLearner: training-data
accumulation, fit/predict/query/teach, :23-213) and ``code/learners.py``
(ActiveLearner.teach with ``only_new``, :81-99; query-by-committee
Committee with vote/consensus, :239-416), adapted in the reference to
X-as-pair-lists (base.py:74).  The sklearn/Keras adapter layer
(``code/keras_wrapper.py``) exists only to squeeze a Keras model into
modAL's estimator contract — with functional TrainStates no adapter is
needed, which retires that component by design.

``ActiveLearner`` keeps the same public surface (fit / predict /
predict_proba / query / teach / score) over pair data ``(left, right, y)``.
``QueryCommittee`` implements vote / vote_proba / consensus and
disagreement-based querying over a stacked-params ensemble.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu import train as T
from alink_tpu.active.uncertainty import uncertainty_sampling


class ActiveLearner:
    """Pool-based active learner (base.py:23-213 + learners.py:15-105).

    Args:
        state: a ``train.TrainState`` for a siamese model.
        query_strategy: ``(probs, n_instances) -> indices`` (our sampling
            functions); the reference passes modAL-style callables
            (existing_al.py:43-49).
        fit_kwargs: forwarded to ``train.fit`` on every (re)fit.
    """

    def __init__(
        self,
        state: T.TrainState,
        query_strategy: Callable = uncertainty_sampling,
        *,
        key: jax.Array | None = None,
        **fit_kwargs,
    ):
        self.state = state
        self.query_strategy = query_strategy
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.fit_kwargs = dict(fit_kwargs)
        self._left = None
        self._right = None
        self._y = None

    # -- training-data bookkeeping (base.py:62-128) --

    def _add_training_data(self, left, right, y):
        left, right, y = (np.asarray(left), np.asarray(right), np.asarray(y))
        if self._y is None:
            self._left, self._right, self._y = left, right, y
        else:
            self._left = np.concatenate([self._left, left])
            self._right = np.concatenate([self._right, right])
            self._y = np.concatenate([self._y, y])

    def fit(self, left, right, y, **overrides):
        """Fit on exactly the given data (base.py:131-151)."""
        self._left, self._right, self._y = (np.asarray(left),
                                            np.asarray(right), np.asarray(y))
        return self._fit(left, right, y, **overrides)

    def _fit(self, left, right, y, **overrides):
        self.key, k = jax.random.split(self.key)
        kwargs = {**self.fit_kwargs, **overrides}
        kwargs.setdefault("epochs", 1)
        kwargs.setdefault("batch_size", min(64, len(np.asarray(y))))
        self.state, logs = T.fit(self.state, jnp.asarray(left),
                                 jnp.asarray(right), jnp.asarray(y),
                                 key=k, **kwargs)
        return logs

    def teach(self, left, right, y, only_new: bool = False, **overrides):
        """Add data and refit (learners.py:81-99).  ``only_new=True`` fits
        on just the new samples (the baseline's usage, existing_al.py:117)."""
        self._add_training_data(left, right, y)
        if only_new:
            return self._fit(left, right, y, **overrides)
        return self._fit(self._left, self._right, self._y, **overrides)

    # -- inference (base.py:154-176) --

    def predict_logits(self, left, right) -> jnp.ndarray:
        """Raw pre-softmax outputs."""
        return self.state.logits_fn(self.state.params, jnp.asarray(left),
                                    jnp.asarray(right))

    def predict_proba(self, left, right) -> jnp.ndarray:
        """Class probabilities — the modAL/sklearn predict_proba contract
        (base.py:154-176); acquisition functions (classifier_entropy etc.)
        consume exactly this."""
        return jax.nn.softmax(self.predict_logits(left, right), axis=-1)

    def predict(self, left, right) -> jnp.ndarray:
        return jnp.argmax(self.predict_logits(left, right), axis=-1)

    def score(self, left, right, y) -> float:
        pred = self.predict(left, right)
        return float(jnp.mean((pred == jnp.asarray(y)).astype(jnp.float32)))

    # -- querying (base.py:179-195) --

    def query(self, left, right, n_instances: int = 1) -> np.ndarray:
        probs = self.predict_proba(left, right)
        return np.asarray(self.query_strategy(probs, n_instances))


class BayesianOptimizer(ActiveLearner):
    """Pool-based Bayesian optimisation (learners.py:108-230).

    The reference's variant tracks the best (X, y) seen and queries by an
    acquisition function over the estimator's predictions; only max-score
    acquisition is exercised anywhere.  ``query_strategy`` here maps
    ``(values, n_instances) -> indices`` over predicted genuine scores.
    """

    def __init__(self, state, query_strategy=None, **kwargs):
        if query_strategy is None:
            def query_strategy(probs, n):  # max predicted score (greedy EI)
                return jax.lax.top_k(probs[:, 1], n)[1]
        super().__init__(state, query_strategy, **kwargs)
        self.X_max = None
        self.y_max = -np.inf

    def _record_max(self, left, right, y):
        y = np.asarray(y)
        if y.size and float(y.max()) > self.y_max:
            i = int(np.argmax(y))
            self.y_max = float(y.max())
            self.X_max = (np.asarray(left)[i], np.asarray(right)[i])

    def fit(self, left, right, y, **overrides):
        logs = super().fit(left, right, y, **overrides)
        self._record_max(left, right, y)
        return logs

    def teach(self, left, right, y, only_new: bool = False, **overrides):
        logs = super().teach(left, right, y, only_new=only_new, **overrides)
        self._record_max(left, right, y)
        return logs

    def get_max(self):
        """Best observation so far (learners.py get_max)."""
        return self.X_max, self.y_max


class CommitteeRegressor:
    """Query-by-committee for regressors (learners.py:419-505).

    Members are ``(params, predict_fn)`` pairs over pair inputs; consensus
    is the member mean and disagreement the member std (the reference's
    ``max_std_sampling`` default).
    """

    def __init__(self, members):
        self.members = list(members)

    def predict_members(self, left, right) -> jnp.ndarray:
        return jnp.stack([fn(p, jnp.asarray(left), jnp.asarray(right))
                          for p, fn in self.members])  # (E, N)

    def predict(self, left, right, return_std: bool = False):
        preds = self.predict_members(left, right)
        mean = jnp.mean(preds, axis=0)
        if return_std:
            return mean, jnp.std(preds, axis=0)
        return mean

    def query(self, left, right, n_instances: int = 1) -> np.ndarray:
        """Max-std disagreement sampling (modAL max_std_sampling)."""
        _, std = self.predict(left, right, return_std=True)
        return np.asarray(jax.lax.top_k(std, n_instances)[1])


class QueryCommittee:
    """Query-by-committee (learners.py:239-416) over a stacked ensemble.

    Wraps ``active.committee.Committee`` with modAL's committee API:
    ``vote`` (per-member hard labels), ``vote_proba``, ``consensus``
    (mean probability), and vote-entropy disagreement querying.
    """

    def __init__(self, committee, n_classes: int = 2):
        self.committee = committee
        self.n_classes = n_classes

    def vote_proba(self, left, right) -> jnp.ndarray:
        return self.committee.member_probs(jnp.asarray(left),
                                           jnp.asarray(right))  # (E, N, C)

    def vote(self, left, right) -> jnp.ndarray:
        return jnp.argmax(self.vote_proba(left, right), axis=-1)  # (E, N)

    def consensus_proba(self, left, right) -> jnp.ndarray:
        return jnp.mean(self.vote_proba(left, right), axis=0)  # (N, C)

    def predict(self, left, right) -> jnp.ndarray:
        return jnp.argmax(self.consensus_proba(left, right), axis=-1)

    def vote_entropy(self, left, right) -> jnp.ndarray:
        """Disagreement = entropy of the members' hard-vote histogram
        (modAL vote_entropy; learners.py consensus machinery)."""
        votes = self.vote(left, right)  # (E, N)
        e = votes.shape[0]
        counts = jnp.stack(
            [jnp.sum(votes == c, axis=0) for c in range(self.n_classes)],
            axis=-1,
        ) / e
        p = jnp.clip(counts, 1e-12, 1.0)
        return -jnp.sum(p * jnp.log(p), axis=-1)

    def query(self, left, right, n_instances: int = 1) -> np.ndarray:
        disagreement = self.vote_entropy(left, right)
        return np.asarray(jax.lax.top_k(disagreement, n_instances)[1])
