"""Disparity selection + oracle gate as masked device computation.

Reference: the selection block of the A-LINK loop (``code/ALINK.py:171-204``,
identically ``ALINK_arc.py:168-201``, ``ALINK_MTP.py:181-214``):

1. per noise channel, compare the student's genuine probability ``c1`` under
   that noise with the committee's clean genuine probability ``c2``:
   - default: keep the top ``disparity_ratio`` fraction by |c1 - c2|
     (the reference appends ``-|c1 - c2|`` and takes the smallest —
     ALINK.py:178-184);
   - ``blind_strategy``: keep indices where the 0.5-thresholded decisions
     differ (ALINK.py:176-178);
2. intersect the per-noise selections — a pair is picked only if *every*
   noise flips/diverges it (ALINK.py:186-189);
3. oracle gate (ALINK.py:192-204): for each picked pair whose committee
   prediction is outside the grey band ``(0.5 - eps, 0.5 + eps)`` the
   oracle is charged one query (ACTIVE_COUNT), and the pair joins the
   training queue only if the committee agrees with the oracle's label.

The reference runs this as Python loops over ``Set`` objects; here every
step is a boolean mask over the fixed-size pair batch, computed in one jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SelectionResult(NamedTuple):
    selected: jnp.ndarray      # (N,) bool — survived all-noise intersection
    queried: jnp.ndarray       # (N,) bool — selected & gated & M1 correct
    oracle_charges: jnp.ndarray  # scalar int — ACTIVE_COUNT increment
    pseudo_labels: jnp.ndarray   # (N,) int — round(M1 genuine prob)


def disparity_masks(
    student_probs: jnp.ndarray,
    committee_probs: jnp.ndarray,
    disparity_ratio: float,
    blind_strategy: bool,
    valid: jnp.ndarray | None = None,
    k_take: jnp.ndarray | int | None = None,
) -> jnp.ndarray:
    """Per-noise selection masks (ALINK.py:171-184).

    Args:
        student_probs: (K, N) student genuine probability under each of the
            K noise channels (``dp[j][1]``, ALINK.py:175).
        committee_probs: (N,) committee genuine probability on clean pairs
            (``ensemblePredictions[j][1]``).
        valid: optional (N,) bool — False rows are shape padding and are
            never selected.  Lets callers run the selection at a bucketed
            batch width so the compiled program does not depend on the
            per-iteration pair count (an exact-width program retraces
            every round the all-pairs count changes).  Semantics equal
            the unpadded call on the valid rows: invalid disparities sink
            to -inf (sorted last, stable order of valid rows preserved)
            and the take count is floor(valid_count * ratio) — the same
            ``int(n * ratio)`` the reference computes (ALINK.py:181).

    Returns (K, N) bool masks.
    """
    c2 = committee_probs[None, :]
    if blind_strategy:
        m = (student_probs >= 0.5) != (c2 >= 0.5)
        return m if valid is None else m & valid[None, :]
    n = student_probs.shape[1]
    disparity = jnp.abs(student_probs - c2)  # (K, N)
    if valid is None:
        k_take = int(n * disparity_ratio)
    else:
        if k_take is None:
            # Device fallback: f32 product — can differ by one from the
            # float64 int(n * ratio) at representation boundaries (e.g.
            # n=3, ratio=1/3); callers who know the real row count on the
            # host should pass the exact ``int(n * ratio)`` as k_take.
            k_take = (jnp.sum(valid).astype(jnp.float32)
                      * disparity_ratio).astype(jnp.int32)
        disparity = jnp.where(valid[None, :], disparity, -jnp.inf)
    # Reference: argsort of -|c1-c2| ascending, first k => largest first.
    order = jnp.argsort(-disparity, axis=1)
    ranks = jnp.argsort(order, axis=1)
    return ranks < k_take


def intersect_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """All-noise intersection (ALINK.py:186-189): (K, N) -> (N,)."""
    return jnp.all(masks, axis=0)


def oracle_gate(
    selected: jnp.ndarray,
    committee_probs: jnp.ndarray,
    oracle_labels: jnp.ndarray,
    eps: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Grey-band gate + pseudo-oracle agreement (ALINK.py:192-204).

    Returns (queried mask, oracle charge count).  A selected pair outside
    the band charges the oracle once; it is queued for training only when
    the committee's thresholded decision matches the oracle label.
    """
    confident = (committee_probs <= 0.5 - eps) | (committee_probs >= 0.5 + eps)
    charged = selected & confident
    agree = (committee_probs >= 0.5) == (oracle_labels >= 0.5)
    return charged & agree, jnp.sum(charged.astype(jnp.int32))


@partial(jax.jit, static_argnames=("disparity_ratio", "blind_strategy", "eps"))
def select_queries(
    student_probs: jnp.ndarray,
    committee_probs: jnp.ndarray,
    oracle_labels: jnp.ndarray,
    *,
    disparity_ratio: float,
    blind_strategy: bool,
    eps: float,
    valid: jnp.ndarray | None = None,
    k_take: jnp.ndarray | None = None,
) -> SelectionResult:
    """The full selection block (ALINK.py:171-204) in one device pass.

    ``valid``: optional (N,) bool padding mask — see ``disparity_masks``;
    padding rows are never selected, queried, or charged.
    ``k_take``: optional precomputed take count (a traced scalar is fine)
    — pass the host-exact ``int(real_rows * ratio)`` for bit-identical
    reference take-count semantics on the padded path."""
    masks = disparity_masks(student_probs, committee_probs, disparity_ratio,
                            blind_strategy, valid=valid, k_take=k_take)
    selected = intersect_masks(masks)
    queried, charges = oracle_gate(selected, committee_probs, oracle_labels,
                                   eps)
    # roundoff (helpers.py:39-46): committee prob -> hard pseudo-label.
    pseudo = (committee_probs >= 0.5).astype(jnp.int32)
    return SelectionResult(selected, queried, charges, pseudo)
