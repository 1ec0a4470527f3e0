"""Benchmark: ArcFace-112 embedding throughput (faces/sec/chip).

The reference's embedding path runs MXNet at batch=1
(``code/face_model.py:39,86-93``) with a per-image Python loop around it
(``code/siamese.py:232-234``) — the headline efficiency defect BASELINE.md
records.  This benchmark measures the rebuilt path: the jit'd bfloat16
ArcFace LResNet100E-II forward (alink_tpu/models/arcface.py) embedding
112x112 faces in large batches.

Measurement notes: host<->device round trips through the device tunnel cost
tens of ms, so the benchmark runs ``iters`` forwards inside ONE jit via
``lax.fori_loop`` (serialised by a scalar data dependency) and forces
completion with a single scalar fetch; the fetch latency is measured
separately and subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against BASELINE.json's north-star target of
10,000 detected+aligned+embedded faces/sec/chip (the reference repo
publishes no throughput numbers, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_FACES_PER_SEC = 10_000.0


def _sync(x) -> float:
    """Force device completion via a scalar host fetch."""
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main() -> None:
    try:
        # Persistent compile cache: repeated driver runs skip the ~minutes
        # of remote AOT compilation.
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from alink_tpu.models import ArcFaceResNet100

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 8  # measured sweet spot (BENCHMARKS.md)
    iters = 30 if on_tpu else 2
    model = ArcFaceResNet100() if on_tpu else ArcFaceResNet100(
        stage_sizes=(1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 112, 112, 3), jnp.float32))

    @jax.jit
    def embed_chain(p, x, n):
        def body(i, carry):
            x, acc = carry
            e = model.apply(p, x)
            # Scalar fold-back serialises iterations without changing the
            # per-iteration work.
            return x + 0.0 * jnp.mean(e), acc + jnp.mean(e)
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))[1]

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 112, 112, 3),
                           jnp.float32, 0.0, 255.0)
    _sync(embed_chain(params, x, 2))  # compile + warm-up

    t0 = time.perf_counter()
    _sync(embed_chain(params, x, 0))
    overhead = time.perf_counter() - t0  # dispatch + fetch latency

    t0 = time.perf_counter()
    _sync(embed_chain(params, x, iters))
    elapsed = max(time.perf_counter() - t0 - overhead, 1e-9)

    faces_per_sec = batch * iters / elapsed
    print(json.dumps({
        "metric": "arcface112_embed_throughput",
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec/chip",
        "vs_baseline": round(faces_per_sec / NORTH_STAR_FACES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
