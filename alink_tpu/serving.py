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
- ``MicroBatcher``  — dynamic request batching: concurrent single-image
  requests coalesce into one bucketed device call.

Everything batches; per-call work is jit-cached by shape.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from alink_tpu.ops import pairwise


class MicroBatcher:
    """Dynamic request batching with shape buckets (TPU serving idiom).

    Single requests are the reference's serving reality (one image per
    ``predict`` call); on TPU per-call dispatch wastes the chip and
    every new batch shape triggers a fresh XLA compile.  This batcher
    coalesces concurrent ``submit`` calls into one device call:

    - requests queue until ``max_batch`` are waiting or ``max_delay_s``
      has passed since the oldest arrived;
    - the batch pads up to a power-of-two *bucket* (bounded compile
      cache: at most log2(max_batch)+1 shapes ever compile);
    - one worker thread calls ``fn`` on the padded batch and fans
      results back out to per-request futures (padding rows are
      discarded);
    - an ``fn`` failure propagates to every future in that batch.

    Args:
        fn: batched model call, ``(N, ...) array -> (N, ...) results``
            (e.g. ``Verifier.embed`` or ``FaceModel.process``).
        max_batch: largest device batch (and largest bucket).
        max_delay_s: latency budget a lone request waits for company.
    """

    def __init__(self, fn: Callable, max_batch: int = 64,
                 max_delay_s: float = 0.005):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.fn = fn
        self.max_batch = max_batch
        self.max_delay_s = max_delay_s
        self.buckets = []
        b = 1
        while b < max_batch:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(max_batch)
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        # Guards the closed-flag/enqueue pair: without it a submit()
        # racing close() could land its request BEHIND the shutdown
        # sentinel and leave its Future unresolved forever.
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, item) -> Future:
        """Enqueue one request; the Future resolves to its result row."""
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            # Arrival timestamp: the delay window is anchored to when the
            # OLDEST request arrived, not when the worker picked it up.
            self._q.put((item, fut, time.monotonic()))
        return fut

    def __call__(self, item):
        """Blocking convenience: submit + wait."""
        return self.submit(item).result()

    def _drain(self, first):
        """Collect up to max_batch requests within the delay window.

        The deadline counts from the first request's ARRIVAL: if the
        worker was busy with the previous batch when it arrived, the
        remaining budget is already partly (or fully) spent — otherwise
        a queued request could wait ~2x max_delay_s under sustained
        load.
        """
        batch = [first]
        deadline = first[2] + self.max_delay_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-signal shutdown for the outer loop
                break
            batch.append(nxt)
        return batch

    def _worker(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = self._drain(first)
            # EVERYTHING per-batch stays inside the guard: a stacking
            # error (mismatched request shapes), a short fn result, or a
            # cancelled Future must fail that batch's futures — never
            # kill the worker thread (which would wedge every later
            # submit forever).
            try:
                items = [np.asarray(it) for it, _, _ in batch]
                n = len(items)
                bucket = next(b for b in self.buckets if b >= n)
                padded = np.stack(items + [items[-1]] * (bucket - n))
                out = np.asarray(self.fn(padded))
                results = [out[i] for i in range(n)]
            except Exception as exc:  # noqa: BLE001 — fan out to futures
                for _, fut, _ in batch:
                    if not fut.cancelled():
                        fut.set_exception(exc)
                continue
            for res, (_, fut, _) in zip(results, batch):
                if not fut.cancelled():
                    fut.set_result(res)

    def close(self) -> None:
        """Flush pending requests and stop the worker."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._thread.join(timeout=30.0)

    def __enter__(self) -> "MicroBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class Verifier:
    """Face verification/identification service.

    Args:
        featurize: batched ``(N, H, W, C) -> (N, D)`` embedding fn —
            typically ``detect.FaceModel(...).process`` for raw photos or
            a bare embedder for pre-aligned crops.  For enrollment from
            uncurated photos, screen with ``FaceModel.pipeline_valid``
            first and drop not-found rows — ``process`` embeds a zero
            chip for images with no detected face (deterministic, but
            still a gallery entry nothing should match).
        head_params: siamese verification head params (SiameseHead tree).
        mesh: optional device mesh; enables the sharded score grid.
    """

    def __init__(self, featurize, head_params, mesh=None):
        self.featurize = featurize
        self.head_params = head_params
        self.mesh = mesh
        self._gallery_feats: jnp.ndarray | None = None
        self._gallery_labels: list = []
        # enroll() is read-concat-write; concurrent request threads (the
        # MicroBatcher serving model) would otherwise lose one thread's
        # feature rows while BOTH label extends survive — silently
        # desynchronising labels from features forever after.
        self._gallery_lock = threading.Lock()

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
        """Add faces to the device-resident gallery (thread-safe)."""
        if len(labels) != len(images):
            # Fail before paying a full embed pass for a mislengthed call.
            raise ValueError("labels must match the image batch")
        feats = self.embed(images)
        with self._gallery_lock:
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
