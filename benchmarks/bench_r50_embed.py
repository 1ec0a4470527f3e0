"""r50 embed-only batch sweep + optional jax.profiler trace.

Attribution tool for the 10k north star (VERDICT r2 #1): how close does
the LResNet50E-IR forward get to its ~15.6k faces/s bf16 roofline as a
function of batch, outside the pipeline?  TRACE=/tmp/dir additionally
captures a profiler trace of the whole pipeline for fusion-overhead
attribution (works only if the axon tunnel supports device tracing).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from alink_tpu.models import ArcFaceResNet50


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    embedder = ArcFaceResNet50()
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    out = {}
    for batch in (64, 128, 256, 512):
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 112, 112, 3),
                               jnp.float32, 0.0, 255.0)

        @jax.jit
        def chain(imgs, n):
            def body(i, carry):
                im, acc = carry
                feats = embedder.apply(eparams, im)
                return im + 0.0 * acc, acc + jnp.mean(feats)
            return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

        iters = 30
        sync(chain(x, 1))
        t0 = time.perf_counter()
        sync(chain(x, 0))
        overhead = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain(x, iters))
        dt = max(time.perf_counter() - t0 - overhead, 1e-9)
        out[f"batch_{batch}"] = round(batch * iters / dt, 1)
    print(json.dumps({"metric": "r50_embed_faces_per_sec", **out}),
          flush=True)

    tdir = os.environ.get("TRACE")
    if tdir:
        from alink_tpu.detect import (CascadeConfig, FaceModel,
                                      init_cascade_params)
        cparams = init_cascade_params(jax.random.PRNGKey(2))
        cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
        fm = FaceModel(eparams, cparams, cfg, embedder=embedder)
        x = jax.random.uniform(jax.random.PRNGKey(3), (256, 160, 160, 3),
                               jnp.float32, 0.0, 255.0)
        sync(fm.process(x))  # compile outside the trace
        with jax.profiler.trace(tdir):
            for _ in range(3):
                sync(fm.process(x))
        print(f"trace written to {tdir}", flush=True)


if __name__ == "__main__":
    main()
