"""Device-feed prefetching: overlap host decode/transfer with compute.

Greenfield (SURVEY.md section 2.2's data layer): the reference feeds
Keras from in-memory NumPy arrays — no streaming path at all.  Here the
pool-resident A-LINK loop also needs no streaming, but two production
surfaces do: epoch training over datasets larger than host memory, and
the serving ingest path.  On TPU the host->device transfer and the
JPEG decode are the only parts of the pipeline XLA cannot overlap for
you — a dispatch-ahead queue does it at the framework level.

``DevicePrefetcher`` wraps any host batch iterator with a background
thread that stays ``depth`` batches ahead, calling ``jax.device_put``
(optionally with a ``Sharding``) so each batch's transfer is in flight
while the previous batch computes.  Order is preserved, iterator
exceptions re-raise at the consumer, and the queue bounds host memory
to ``depth`` batches.

Typical use::

    batches = DevicePrefetcher(decode_batches(paths), depth=2)
    for x in batches:
        state = train_step(state, x)   # transfer of the next x overlaps
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Iterable, Iterator

import jax


class DevicePrefetcher:
    """Background-thread batch prefetcher with device placement.

    Args:
        iterable: source of host batches (any pytrees).
        depth: batches to stay ahead (>=1).  2 double-buffers: one batch
            computing, one in flight.
        sharding: optional ``jax.sharding.Sharding`` (or a pytree prefix
            of shardings) passed to ``device_put`` — e.g. a
            ``NamedSharding(mesh, P('data'))`` to land each batch
            already sharded over the mesh.
        transfer: override the placement fn (defaults to
            ``jax.device_put``); ``None`` disables placement (useful for
            tests and CPU pipelines — the thread still overlaps the
            source's own decode work).  Mutually exclusive with
            ``sharding``: a custom transfer owns placement entirely.
    """

    def __init__(
        self,
        iterable: Iterable[Any],
        depth: int = 2,
        sharding=None,
        transfer: Callable[[Any], Any] | None = jax.device_put,
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        if sharding is not None and transfer is not jax.device_put:
            # Honouring both is ambiguous (whose placement wins?); make
            # the caller choose instead of silently dropping one.
            raise ValueError("pass either sharding or a custom transfer,"
                             " not both")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._transfer = transfer
        self._done = False
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(iter(iterable),), daemon=True)
        self._thread.start()

    # Sentinels (private instances so user values can never collide).
    _DONE = object()

    def _worker(self, it: Iterator[Any]) -> None:
        try:
            for item in it:
                if self._transfer is not None:
                    item = (jax.device_put(item, self._sharding)
                            if self._sharding is not None
                            else self._transfer(item))
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(self._DONE)
        except BaseException as exc:  # noqa: BLE001 — re-raised at consumer
            self._q.put(exc)

    def __iter__(self) -> "DevicePrefetcher":
        return self

    def __next__(self) -> Any:
        if self._done:
            # Sticky: every next() after exhaustion/close terminates,
            # including calls after the _DONE sentinel was consumed.
            raise StopIteration
        item = self._q.get()
        if item is self._DONE:
            self._done = True
            raise StopIteration
        if isinstance(item, BaseException):
            # The worker died delivering this: it will never produce
            # again, so the iterator is exhausted (a consumer that
            # catches the error and keeps iterating must terminate, not
            # block forever on the empty queue).
            self._done = True
            raise item
        return item

    def close(self) -> None:
        """Stop the worker (for abandoning an iteration early)."""
        self._stop.set()
        # Drain until the worker is actually dead: a worker mid-put can
        # still land one item AFTER a single drain pass (it only checks
        # the stop flag after the put succeeds), which on a full queue
        # used to swallow the _DONE sentinel below and leave a later
        # consumer blocked forever in __next__.
        deadline = time.monotonic() + 10.0
        while self._thread.is_alive() and time.monotonic() < deadline:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.1)
        # Deadline path: a daemon worker wedged inside a transfer (e.g. a
        # dead device link) is abandoned rather than hanging close() too.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        # Worker dead (or abandoned) + queue drained: any consumer blocked
        # in __next__ wakes into StopIteration.
        self._done = True
        try:
            self._q.put_nowait(self._DONE)
        except queue.Full:  # only reachable on the abandoned-worker path
            pass

    def __enter__(self) -> "DevicePrefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def prefetch_to_device(iterable, depth: int = 2, sharding=None):
    """Functional spelling of ``DevicePrefetcher`` (flax idiom)."""
    return DevicePrefetcher(iterable, depth=depth, sharding=sharding)
