"""Does splitting the dense cascade into per-stage programs recover the
in-fusion overhead?

Round-4 finding: at dense budgets the R/O-Net stages cost ~2x their
standalone-op sum inside the single fused cascade program, and
optimization_barrier fences do NOT recover it (BENCHMARKS.md round 4) —
the overhead is XLA's whole-program scheduling, not producer/consumer
fusion.  If a stage run as its OWN jitted program costs only its
standalone sum, then round 5's cheap dense fix is dispatch-splitting
(one program per stage: 3-4 dispatches/batch — fine locally, ~100 ms of
launch latency through a remote tunnel), and the fused Pallas tower can
be deprioritised.

Measures, at dense budgets (batch 256 at 160², reported ms/64):
- ``fused_cascade``: the shipped single-program detect_faces.
- ``s1_only`` / ``s2_only`` / ``s3_only``: each stage as its own jit
  over precomputed stage inputs (the split-execution cost is their sum
  plus inter-stage dispatch).
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import _stage1, _stage2, _stage3, detect_faces

BATCH = 256 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, *args, iters=20):
    @jax.jit
    def chain(n, x0, *rest):
        def body(i, carry):
            xx, acc = carry
            out = jnp.mean(jax.tree.leaves(fn(xx, *rest))[0]
                           .astype(jnp.float32))
            return xx + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))[1]

    sync(chain(2, *args))
    t0 = time.perf_counter()
    sync(chain(0, *args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, *args))
    dt = (time.perf_counter() - t0 - ovh) / iters
    print(json.dumps({"case": name,
                      "ms_per_64": round(dt * 1000 * 64 / BATCH, 3)}),
          flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = CascadeConfig.worst_case(thresholds=(0.0, 0.0, 0.0))
    cp = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3),
                           jnp.float32, 0.0, 255.0)
    h = w = SIZE

    timed("fused_cascade", lambda im: detect_faces(cp, im, cfg).boxes, x)

    s1 = jax.jit(jax.vmap(lambda im: _stage1(cp, im, cfg, h, w)))
    s2 = jax.jit(jax.vmap(lambda im, b, s, v: _stage2(cp, im, b, s, v, cfg)))
    s3 = jax.jit(jax.vmap(lambda im, b, s, v: _stage3(cp, im, b, s, v, cfg)))

    b1, sc1, v1 = jax.block_until_ready(s1(x))
    b2, sc2, v2 = jax.block_until_ready(s2(x, b1, sc1, v1))

    timed("s1_only", lambda im: s1(im)[0], x)
    timed("s2_only", lambda im, b, s, v: s2(im, b, s, v)[0], x, b1, sc1, v1)
    timed("s3_only", lambda im, b, s, v: s3(im, b, s, v)[0], x, b2, sc2, v2)


if __name__ == "__main__":
    main()
