"""Dense-scene throughput: lossless worst_case vs the crowd profile.

The dense profile's measured physics (BENCHMARKS.md round-4): ~19 ms/64
of per-crop towers (16K R-Net + 8K O-Net instances at batch 64) + ~7 ms
of per-crop x-folds, flat at ~1.9-2.0k faces/s since round 2.  The
crowd profile (CascadeConfig.crowd, round 5) pools stage-2/3 budgets
across the batch — LOSSY BY CONTRACT — cutting tower+crop instances to
the pooled totals.  This bench measures the full detect->align->embed
pipeline (r50 embedder, FaceModel.pipeline, one jit) at several pooling
ratios, interleaved with the lossless baseline to cancel tunnel drift.

Open thresholds + random weights keep every budget slot live, so each
ratio's number is that profile's WORST case (same convention as
bench.py).  VERDICT r4 target: >=4k faces/s on dense scenes, or a
recorded negative with numbers.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet50

N = 64 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=10):
    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            out = fn(im)
            return im + 0.0 * acc, acc + jnp.mean(out)
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    sync(chain(x, 2))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ovh) / iters
    print(json.dumps({"case": name,
                      "ms_per_64": round(dt * 1000 * 64 / N, 3),
                      "faces_per_sec": round(N / dt, 1)}), flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(0)
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    model = ArcFaceResNet50()
    params = model.init(key, jnp.zeros((1, 112, 112, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(2), (N, SIZE, SIZE, 3),
                           jnp.float32, 0.0, 255.0)

    thr = (0.0, 0.0, 0.0)
    configs = [
        ("worst_case", CascadeConfig.worst_case(thresholds=thr)),
        # Pooling ratios vs worst_case's per-image totals at this batch
        # (stage2: N*256 candidates, stage3: N*128 survivors).
        ("crowd_half", CascadeConfig.crowd(
            thresholds=thr, stage2_total=N * 128, stage3_total=N * 64)),
        ("crowd_quarter", CascadeConfig.crowd(
            thresholds=thr, stage2_total=N * 64, stage3_total=N * 32)),
        ("crowd_eighth", CascadeConfig.crowd(
            thresholds=thr, stage2_total=N * 32, stage3_total=N * 16)),
    ]
    fms = [(name, FaceModel(params, cparams, cfg, embedder=model))
           for name, cfg in configs]
    for rep in range(2):
        for name, fm in fms:
            timed(f"{name}_rep{rep}",
                  lambda im, fm=fm: fm.pipeline(params, cparams, im), x)


if __name__ == "__main__":
    main()
