"""Pipeline throughput with the LResNet50E-IR embedder.

The flagship (bench_pipeline.py) uses r100 — the checkpoint the reference
de-facto deploys (face_model.py:28-41).  The insightface zoo's r50 halves
the embed FLOPs (12.6 vs 24 GFLOP/face, bf16 embed roofline ~15.6k
faces/s on this chip), so deployments that accept the smaller backbone
get a pipeline whose embed stage stops being the dominant cost.  Same
measurement protocol as bench_pipeline.py (fori-chained, latency
subtracted, typical budgets).
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet50


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 2
    size = 160
    if on_tpu:
        embedder = ArcFaceResNet50()
    else:  # CPU smoke run: tiny depth, same code path
        from alink_tpu.models import ArcFaceResNet100
        embedder = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3),
                           jnp.float32, 0.0, 255.0)
    iters = 20 if on_tpu else 1

    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    fm = FaceModel(eparams, cparams, cfg, embedder=embedder)

    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            feats = fm.pipeline(eparams, cparams, im)
            return im + 0.0 * acc, acc + jnp.mean(feats)
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    sync(chain(x, 1))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = max(time.perf_counter() - t0 - overhead, 1e-9)
    print(json.dumps({
        "metric": "detect_align_embed_throughput_r50",
        "profile": "typical",
        "image_size": size,
        "batch": batch,
        "value": round(batch * iters / dt, 1),
        "unit": "faces/sec/chip",
    }), flush=True)


if __name__ == "__main__":
    main()
