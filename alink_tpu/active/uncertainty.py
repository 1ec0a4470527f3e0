"""Classical acquisition functions (modAL-style).

Reference: ``code/uncertainty.py`` — the three measures
(``_proba_uncertainty/_proba_margin/_proba_entropy``, :15-60) and their
sampling wrappers (:133-216) used by the ``existing_al*.py`` baselines.

Implemented as pure batched functions over probability arrays.  The
reference wrappers return pair queries built from ``X[0]`` twice
(uncertainty.py:159 — a latent bug noted in SURVEY.md section 7); here the
sampling functions return *indices* and let the caller gather, which is
also what the baseline driver actually consumes (existing_al.py:104-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def classifier_uncertainty(probs: jnp.ndarray) -> jnp.ndarray:
    """1 - max class probability (uncertainty.py:15-25, 63-83)."""
    return 1.0 - jnp.max(probs, axis=-1)


def classifier_margin(probs: jnp.ndarray) -> jnp.ndarray:
    """Top-1 minus top-2 probability (uncertainty.py:28-43, 86-106)."""
    top2 = jax.lax.top_k(probs, 2)[0]
    return top2[..., 0] - top2[..., 1]


def classifier_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy of the class distribution (uncertainty.py:46-60)."""
    p = jnp.clip(probs, 1e-12, 1.0)
    return -jnp.sum(p * jnp.log(p), axis=-1)


def _multi_argmax(values: jnp.ndarray, n_instances: int) -> jnp.ndarray:
    """Indices of the n largest values (modAL utils.selection semantics)."""
    return jax.lax.top_k(values, n_instances)[1]


def uncertainty_sampling(probs: jnp.ndarray, n_instances: int = 1) -> jnp.ndarray:
    """Most-uncertain indices (uncertainty.py:133-159)."""
    return _multi_argmax(classifier_uncertainty(probs), n_instances)


def margin_sampling(probs: jnp.ndarray, n_instances: int = 1) -> jnp.ndarray:
    """Smallest-margin indices (uncertainty.py:162-187)."""
    return _multi_argmax(-classifier_margin(probs), n_instances)


def entropy_sampling(probs: jnp.ndarray, n_instances: int = 1) -> jnp.ndarray:
    """Highest-entropy indices (uncertainty.py:190-216)."""
    return _multi_argmax(classifier_entropy(probs), n_instances)


STRATEGIES = {
    "uncertainty_sampling": uncertainty_sampling,
    "margin_sampling": margin_sampling,
    "entropy_sampling": entropy_sampling,
}


def get_strategy(name: str):
    """Strategy dispatch mirroring existing_al.py:43-49."""
    try:
        return STRATEGIES[name]
    except KeyError:
        raise NotImplementedError(f"unknown query strategy {name}") from None
