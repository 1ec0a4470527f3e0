"""Dispatch-latency probe -> selection-chunk sizing.

The right ``device_batch`` for the A-LINK selection round depends on the
host<->device link, not the model: VGGFace-ResNet50's per-image
throughput FALLS with batch (71.8 TF/s at image batch 128 vs 44.1 at
1024 — HBM working set), so a locally-attached host wants small chunks,
while through a high-latency tunnel (~35 ms per dispatch+fetch) the
extra dispatches dominate by 13x and large chunks win (both measured:
BENCHMARKS.md "ResNet50 batch-size curve" / bench_selection.py).

``device_batch="auto"`` resolves that knob with a one-time probe at loop
construction: time a tiny compiled dispatch round trip and pick the
measured winner for that regime.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

# Above this per-dispatch round-trip latency the link is "remote":
# at device_batch=64 a 512-pair round pays ~24 extra dispatch+fetch
# round trips (8 chunks x ~3 phases); 2 ms each ~= 50 ms — the point
# where the extra dispatches start eating the ~0.3 s compute saving the
# batch-128 featurizer rate buys.  Measured anchors: local PCIe links
# sit at ~0.1-0.5 ms, the remote tunnel at ~35 ms.
LATENCY_THRESHOLD_S = 2e-3
SMALL_CHUNK = 64     # rides the batch-128 featurizer sweet spot
LARGE_CHUNK = 1024   # amortises per-dispatch latency


def measure_dispatch_latency(iters: int = 10) -> float:
    """Median seconds for one tiny compiled dispatch + host fetch.

    Completion is forced by the host fetch (``float(...)``), not
    ``block_until_ready`` — the remote-device tunnel's
    ``block_until_ready`` does not block (BENCHMARKS.md preamble), and a
    fetch is exactly the round trip the selection loop pays per phase.
    """
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    float(f(x)[0])  # compile + warm
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x)[0])
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def resolve_device_batch(setting, *, probe=measure_dispatch_latency) -> int:
    """``int`` passes through; ``"auto"`` probes the link and picks
    ``SMALL_CHUNK`` (low-latency host) or ``LARGE_CHUNK`` (remote)."""
    if isinstance(setting, str):
        if setting != "auto":
            raise ValueError(
                f"device_batch must be a positive int or 'auto', "
                f"got {setting!r}")
        latency = probe()
        return SMALL_CHUNK if latency < LATENCY_THRESHOLD_S else LARGE_CHUNK
    db = int(setting)
    if db <= 0:
        raise ValueError(f"device_batch must be positive, got {setting!r}")
    return db
