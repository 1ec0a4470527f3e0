"""FaceModel parity API: detect -> align -> embed.

Reference: ``code/face_model.py`` — wraps an MXNet ArcFace checkpoint
(``get_model``, :28-41, batch pinned to 1) with ``get_input`` (detection
disabled in the shipped code, :71-82 — raw transpose only) and
``get_feature`` (forward + L2 normalise, :86-93).

Here the full pipeline is live and batched: MTCNN cascade detection,
template alignment, and the jit'd ArcFace embedder — the reference's
batch=1 constraint (BASELINE.md) is gone by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alink_tpu.detect.cascade import (
    CascadeConfig,
    Detections,
    MTCNNParams,
    align_faces,
    detect_faces,
)
from alink_tpu.models.arcface import ArcFaceResNet100


class FaceModel:
    """Batched detect->align->embed pipeline (code/face_model.py parity).

    Args:
        embed_params: ArcFaceResNet100 params.
        cascade_params: MTCNN cascade params, or None to skip detection
            (the reference ships with detection disabled,
            face_model.py:71-82 — ``get_input`` then just normalises
            pre-cropped images).
    """

    # Reassigning any of these invalidates the cached jits below — the
    # traces close over them, so without this a changed cfg/embedder
    # would silently keep running the OLD budgets/model (same guard as
    # ALinkLoop.__setattr__).
    _TRACED_ATTRS = ("embedder", "cfg")

    def __init__(
        self,
        embed_params,
        cascade_params: MTCNNParams | None = None,
        cfg: CascadeConfig = CascadeConfig(),
        embedder=None,
    ):
        # Any module with ArcFace's apply(params, images)->(N, D) contract
        # works: the r34/r50 zoo variants, or scan_units=True for fast
        # cold starts (params must then be in the stacked layout).
        self.embedder = embedder if embedder is not None else ArcFaceResNet100()
        self.embed_params = embed_params
        self.cascade_params = cascade_params
        self.cfg = cfg
        self._embed_jit = None
        self._process_jit = None

    def __setattr__(self, name, value):
        if name in self._TRACED_ATTRS and getattr(self, "_process_jit",
                                                  None) is not None:
            super().__setattr__("_process_jit", None)
            super().__setattr__("_embed_jit", None)
        elif name in self._TRACED_ATTRS and getattr(self, "_embed_jit",
                                                    None) is not None:
            super().__setattr__("_embed_jit", None)
        super().__setattr__(name, value)

    def detect(self, images: jnp.ndarray) -> Detections:
        if self.cascade_params is None:
            raise ValueError("no cascade params loaded (detection disabled)")
        return detect_faces(self.cascade_params, images, self.cfg)

    def _best_chips(self, cascade_params, images: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Best-face detect + align -> (chips, found) — the one copy of
        the selection/align block behind get_input() and pipeline().

        ``found``: (N,) bool, False when an image had NO valid detection
        (the reference's get_input returns None there, face_model.py:76).
        Fixed shapes rule out a None; instead the chip is zeroed —
        aligning a budget-padding garbage landmark row would otherwise
        hand the embedder an arbitrary warp with no failure signal.
        """
        det = detect_faces(cascade_params, images, self.cfg)
        # Best-scoring valid face per image FIRST (face_model get_input
        # keeps the single detected face) — aligning only that face does
        # 1/budget of the warp work of aligning every budget slot.
        neg = jnp.finfo(det.scores.dtype).min
        best = jnp.argmax(jnp.where(det.valid, det.scores, neg), axis=1)
        found = jnp.any(det.valid, axis=1)
        lmk = jax.vmap(lambda l, b: l[b])(det.landmarks, best)
        chips = align_faces(images, lmk[:, None], self.cfg.output_size)
        # Fence the align→embed seam: letting XLA fuse the warp output's
        # slice/reshape/cast into the embedder's stem measured +0.5 ms/64
        # (benchmarks/exp_boundary.py: warp_embed 8.54 vs warp_BAR_embed
        # 8.05; the relayout itself is free, 0.007 ms standalone) — the
        # barrier makes it a clean standalone op again.  Semantics-neutral.
        chips = jax.lax.optimization_barrier(chips)
        # where(), not multiply: a no-detection image aligns a garbage
        # padding landmark row, and a degenerate row can warp to NaN —
        # 0 * NaN would poison the zeroed chip the contract promises.
        return jnp.where(found[:, None, None, None], chips[:, 0], 0.0), found

    def get_input(self, images: jnp.ndarray) -> jnp.ndarray:
        """Aligned 112x112 face chips (zeroed where no face was found —
        use ``get_input_valid`` for the per-image found mask).

        With detection enabled: best-face detect + align per image
        (the full pipeline of face_model.py:71-82's commented-out path).
        Without: bilinear-resize passthrough (the live reference behaviour,
        which feeds pre-cropped faces straight through, :83-84).
        """
        if self.cascade_params is None:
            from alink_tpu.ops.image import resize

            return resize(images, self.cfg.output_size)
        return self._best_chips(self.cascade_params, images)[0]

    def get_input_valid(self, images: jnp.ndarray
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(chips, found): like ``get_input`` plus the per-image
        detection-success mask (the batched analog of the reference's
        None return, face_model.py:76)."""
        if self.cascade_params is None:
            from alink_tpu.ops.image import resize

            chips = resize(images, self.cfg.output_size)
            return chips, jnp.ones(images.shape[0], bool)
        return self._best_chips(self.cascade_params, images)

    def get_feature(self, aligned: jnp.ndarray) -> jnp.ndarray:
        """L2-normalised 512-d embeddings for aligned chips
        (face_model.py:86-93), batched in one jit'd forward."""
        if self._embed_jit is None:
            self._embed_jit = jax.jit(self.embedder.apply)
        return self._embed_jit(self.embed_params, aligned)

    def process(self, images: jnp.ndarray) -> jnp.ndarray:
        """End-to-end pipeline: the ``siamese.ArcFace.process`` role
        (code/siamese.py:232-234) without the per-image Python loop.

        The whole detect->align->embed chain compiles as ONE program: a
        single dispatch per batch instead of one per stage (host->device
        launch latency is tens of ms through a remote tunnel, and stage
        boundaries would otherwise round-trip intermediates through HBM
        without fusion)."""
        if self.cascade_params is None:
            return self.get_feature(self.get_input(images))
        if self._process_jit is None:
            self._process_jit = jax.jit(self.pipeline)
        return self._process_jit(self.embed_params, self.cascade_params,
                                 images)

    def pipeline(self, embed_params, cascade_params,
                 images: jnp.ndarray) -> jnp.ndarray:
        """The detect->align->embed chain as a pure traceable function —
        embed it in larger jitted programs (benchmarks, serving batchers);
        ``process`` is its jitted convenience wrapper.  No-face images
        embed a zero chip (see ``_best_chips``; use ``pipeline_valid``
        when the caller needs the mask)."""
        chips, _ = self._best_chips(cascade_params, images)
        return self.embedder.apply(embed_params, chips)

    def pipeline_valid(self, embed_params, cascade_params,
                       images: jnp.ndarray
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(embeddings, found): ``pipeline`` plus the per-image
        detection-success mask."""
        chips, found = self._best_chips(cascade_params, images)
        return self.embedder.apply(embed_params, chips), found

    def get_ga(self, aligned: jnp.ndarray, ga_model, ga_params
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Gender/age estimation (face_model.py:95-107): run the genderage
        network on the aligned chips and decode its 202-d output.

        ``ga_model`` is the reference-parity ``GenderAgeResNet50`` (the
        gamodel checkpoint, convertible via ``tools/convert_mxnet.py
        genderage``) — or any module whose ``apply(params, chips)``
        returns (N, 202); batched, vs the reference's batch=1 forward.
        """
        from alink_tpu.models.genderage import decode_ga

        return decode_ga(ga_model.apply(ga_params, aligned))

    def get_ga_from_embedding(self, aligned: jnp.ndarray, ga_head, ga_params
                              ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Greenfield alternative to ``get_ga``: decode a lightweight
        ``GenderAgeHead`` over this model's OWN embeddings, sharing the
        recognition trunk instead of running a second backbone."""
        from alink_tpu.models.genderage import decode_ga

        feats = self.get_feature(aligned)
        return decode_ga(ga_head.apply(ga_params, feats))
