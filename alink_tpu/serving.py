"""Batched verification / identification serving API.

The deployment story the reference never had (its inference surface is
scattered across eval scripts, SURVEY.md section 3.5): a single object
holding the detect->align->embed pipeline and a verification head, with a
device-resident gallery.

- ``verify_pairs``  — P(genuine) for batched image pairs (end to end).
- ``enroll``        — embed faces into the gallery (features stay on
  device; the host keeps only labels).
- ``identify``      — top-k gallery matches per probe via the fused
  pairwise engine.
- ``score_matrix``  — all-pairs scores for offline evaluation, sharded
  over a mesh when one is supplied.

Everything batches; per-call work is jit-cached by shape.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from alink_tpu.ops import pairwise


class Verifier:
    """Face verification/identification service.

    Args:
        featurize: batched ``(N, H, W, C) -> (N, D)`` embedding fn —
            typically ``detect.FaceModel(...).process`` for raw photos or
            a bare embedder for pre-aligned crops.
        head_params: siamese verification head params (SiameseHead tree).
        mesh: optional device mesh; enables the sharded score grid.
    """

    def __init__(self, featurize, head_params, mesh=None):
        self.featurize = featurize
        self.head_params = head_params
        self.mesh = mesh
        self._gallery_feats: jnp.ndarray | None = None
        self._gallery_labels: list = []

    # -- verification ------------------------------------------------------

    def embed(self, images) -> jnp.ndarray:
        return self.featurize(jnp.asarray(images))

    def verify_pairs(self, left_images, right_images) -> jnp.ndarray:
        """(N,) P(genuine) for aligned image pairs."""
        return pairwise.pair_scores(
            self.head_params, self.embed(left_images),
            self.embed(right_images))

    # -- gallery -----------------------------------------------------------

    @property
    def gallery_size(self) -> int:
        return 0 if self._gallery_feats is None else int(
            self._gallery_feats.shape[0])

    def enroll(self, images, labels: Sequence) -> None:
        """Add faces to the device-resident gallery."""
        feats = self.embed(images)
        if len(labels) != feats.shape[0]:
            raise ValueError("labels must match the image batch")
        if self._gallery_feats is None:
            self._gallery_feats = feats
        else:
            self._gallery_feats = jnp.concatenate(
                [self._gallery_feats, feats])
        self._gallery_labels.extend(labels)

    def identify(self, probe_images, k: int = 1):
        """Top-k gallery identities per probe.

        Returns (labels (N, k) list-of-lists, scores (N, k) array).
        """
        if self.gallery_size == 0:
            raise ValueError("gallery is empty — enroll faces first")
        probes = self.embed(probe_images)
        k = min(k, self.gallery_size)
        scores, idx = pairwise.identification_topk(
            self.head_params, probes, self._gallery_feats, k=k)
        idx = np.asarray(idx)
        labels = [[self._gallery_labels[j] for j in row] for row in idx]
        return labels, np.asarray(scores)

    # -- offline evaluation --------------------------------------------------

    def score_matrix(self, images_or_feats, *, precomputed: bool = False
                     ) -> jnp.ndarray:
        """All-pairs P(genuine) over one face set (the DFW evaluation
        grid); uses the mesh-sharded engine when a mesh was supplied."""
        feats = (jnp.asarray(images_or_feats) if precomputed
                 else self.embed(images_or_feats))
        if self.mesh is not None:
            return pairwise.score_matrix_sharded(
                self.mesh, self.head_params, feats, feats)
        return pairwise.score_matrix(self.head_params, feats, feats)
