"""Per-phase timing + profiler trace capture.

Greenfield (SURVEY.md section 5.1): the reference's only observability is
``print``/tqdm.  ``Timings`` accumulates wall-clock per named phase
(detect / align / embed / select / finetune / ...) with correct handling of
JAX async dispatch (an optional ``block`` arg forces completion before the
clock stops); ``trace`` wraps ``jax.profiler.trace`` for XLA-level traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timings:
    """Accumulated per-phase wall times."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        """Time a phase.

        JAX dispatch is async: without a wait, a phase that launches a
        multi-second device program is charged milliseconds and the cost
        lands on whichever later phase first fetches a result.  Two ways
        to count device work correctly:

        - arrays that exist BEFORE the block: pass ``block_on=...``;
        - arrays produced INSIDE the block: the yielded handle —
          ``with t.phase("x") as ph: out = f(); ph.block_on(out)`` —
          registers them to be waited on before the clock stops.
        """
        pending = []

        class _Handle:
            @staticmethod
            def block_on(tree):
                pending.append(tree)
                return tree

        start = time.perf_counter()
        try:
            yield _Handle()
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            for tree in pending:
                jax.block_until_ready(tree)
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Run ``fn`` and charge its (blocked) wall time to ``name``."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:>20s}: {t:8.3f}s total, {c:5d} calls, "
                         f"{1e3 * t / max(c, 1):8.2f} ms/call")
        return "\n".join(lines)

    def as_dict(self) -> dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
