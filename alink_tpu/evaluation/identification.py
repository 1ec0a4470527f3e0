"""Gallery identification evaluation.

Reference: ``code/ALINK_MTP.py:271-289`` — the only in-driver evaluation:
the gallery is the *first* image of every test subject, every remaining
image is a probe, and a probe is correct when the student model scores it
highest against its own subject's gallery entry.  The reference loops
probes one at a time through ``predict``; here the whole probe x gallery
grid is a single scored pass.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from alink_tpu.data.loader import PersonStacks


def gallery_top1(
    score_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    subjects: PersonStacks,
) -> float:
    """Top-1 identification accuracy over a subject gallery.

    Args:
        score_fn: ``(probes (N, ...), gallery (G, ...)) -> (N, G)`` genuine
            scores — typically a partial of the pairwise engine over an
            image model.
        subjects: per-subject stacks; image 0 of each subject is its
            gallery entry (ALINK_MTP.py:272-275), the rest are probes.

    Returns the fraction of probes whose argmax gallery entry is their own
    subject (ALINK_MTP.py:278-289).
    """
    live = np.flatnonzero(subjects.counts > 0)
    gallery = subjects.images[live, 0]
    probes, truth = [], []
    for gi, p in enumerate(live):
        c = int(subjects.counts[p])
        for s in range(1, c):
            probes.append(subjects.images[p, s])
            truth.append(gi)
    if not probes:
        return 0.0
    probes = np.stack(probes)
    truth = np.asarray(truth)
    scores = np.asarray(score_fn(probes, gallery))
    return float(np.mean(np.argmax(scores, axis=1) == truth))
