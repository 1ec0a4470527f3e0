"""Active-learning core: committee, disparity selection, the A-LINK loop.

Reference: ``code/committee.py`` (Bagging), the selection logic inlined in
``code/ALINK.py:145-259``, and the modAL-derived classical-AL stack
(``code/base.py``, ``code/learners.py``, ``code/uncertainty.py``).

TPU-first architecture (SURVEY.md section 7):

- ``committee``   — the M1 ensemble as **stacked params + vmap** (one
  compiled forward for all members) instead of a Python loop over models;
  the noise fan-out (``Bagging.attackModel``) as one batched op per channel.
- ``selection``   — disparity scoring, per-noise top-k, all-noise
  intersection and the oracle gate as masked device computation
  (ALINK.py:171-204); the host sees only boolean masks.
- ``loop``        — the A-LINK/A2-LINK driver: host-orchestrated outer loop
  with device-resident inner computation, checkpointable loop state (the
  reference loses selection state on interruption, SURVEY.md section 5.4).
- ``uncertainty`` — classical acquisition functions (uncertainty / margin /
  entropy sampling, code/uncertainty.py:133-216).
- ``learners``    — ActiveLearner / query-by-committee API surface
  (code/base.py, code/learners.py) over TrainStates.
"""

from alink_tpu.active.committee import Committee  # noqa: F401
from alink_tpu.active.selection import (  # noqa: F401
    SelectionResult,
    disparity_masks,
    intersect_masks,
    oracle_gate,
    select_queries,
)
from alink_tpu.active.uncertainty import (  # noqa: F401
    classifier_entropy,
    classifier_margin,
    classifier_uncertainty,
    entropy_sampling,
    margin_sampling,
    uncertainty_sampling,
)
from alink_tpu.active.learners import (  # noqa: F401
    ActiveLearner,
    BayesianOptimizer,
    CommitteeRegressor,
    QueryCommittee,
)
from alink_tpu.active.loop import ALinkLoop, ALinkState  # noqa: F401
