"""Pipeline batch sweep: find the detect->align->embed sweet spot.

The embed-only sweet spot was measured at batch 256 (BENCHMARKS.md batch
sweep 128/256/512/1024 = 7106/7264/7064/6791 faces/s), but the full
pipeline adds cascade+align stages whose per-image cost amortises
differently — this sweep measures the pipeline at several batch sizes on
the typical workload profile to pick the headline batch empirically.

Usage: PYTHONPATH=. python benchmarks/bench_pipeline_sweep.py [batches...]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet100


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"
    batches = [int(b) for b in sys.argv[1:]] or (
        [192, 256, 384, 512] if on_tpu else [2])
    size = 160
    iters = 20 if on_tpu else 1

    embedder = (ArcFaceResNet100() if on_tpu
                else ArcFaceResNet100(stage_sizes=(1, 1, 1, 1)))
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    fm = FaceModel(eparams, cparams, cfg, embedder=embedder)

    for batch in batches:
        x = jax.random.uniform(jax.random.PRNGKey(2),
                               (batch, size, size, 3), jnp.float32,
                               0.0, 255.0)

        @jax.jit
        def chain(imgs, n):
            def body(i, carry):
                im, acc = carry
                feats = fm.pipeline(eparams, cparams, im)
                return im + 0.0 * acc, acc + jnp.mean(feats)
            return jax.lax.fori_loop(0, n, body,
                                     (imgs, jnp.float32(0.0)))[1]

        sync(chain(x, 1))
        t0 = time.perf_counter()
        sync(chain(x, 0))
        overhead = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain(x, iters))
        dt = max(time.perf_counter() - t0 - overhead, 1e-9)
        print(json.dumps({
            "metric": "pipeline_throughput", "profile": "typical",
            "batch": batch, "value": round(batch * iters / dt, 1),
            "unit": "faces/sec/chip",
        }), flush=True)


if __name__ == "__main__":
    main()
