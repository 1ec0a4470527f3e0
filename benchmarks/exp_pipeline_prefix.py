"""Whole-pipeline prefix attribution: marginal in-fusion cost per stage.

The stage-profile numbers (profile_pipeline.py) time each stage as its
own program; the fused pipeline (FaceModel.pipeline) has measured
~1 ms/64 MORE than the stage sum ("fusion overhead", BENCHMARKS.md).
This experiment times *prefixes* of the fused program — stage1;
stage1+2; stage1+2+3; +umeyama+align; +embed — so each delta is the
marginal cost of that stage *inside* the fused schedule, and the last
prefix equals the headline pipeline.  Comparing deltas against the
standalone stage numbers localises which stage picks up the scheduling
overhead.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import (_stage1, _stage2, _stage3,
                                      align_faces)
from alink_tpu.models import ArcFaceResNet100
BATCH = 256 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=20):
    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            out = jnp.mean(jax.tree.leaves(fn(im))[0].astype(jnp.float32))
            return im + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    sync(chain(x, 1))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = max(time.perf_counter() - t0 - overhead, 1e-9) / iters
    ms64 = dt * 1000.0 * 64.0 / BATCH
    print(json.dumps({"prefix": name, "ms_per_64": round(ms64, 3),
                      "faces_per_sec": round(BATCH / dt, 1)}), flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    # EMBEDDER=r50 switches the embed prefix to LResNet50 (the
    # configuration chasing the 10k target, bench_r50_pipeline.py).
    import os
    depth = os.environ.get("EMBEDDER", "r100")
    if jax.default_backend() != "tpu":
        embedder = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))
    elif depth == "r50":
        from alink_tpu.models import ArcFaceResNet50
        embedder = ArcFaceResNet50()
    else:
        embedder = ArcFaceResNet100()
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(2),
                           (BATCH, SIZE, SIZE, 3), jnp.float32, 0, 255)

    def upto(img, stop):
        h, w = SIZE, SIZE
        b, s, v = _stage1(cparams, img, cfg, h, w)
        if stop == "s1":
            return jnp.mean(b) + jnp.mean(s)
        b, s, v = _stage2(cparams, img, b, s, v, cfg)
        if stop == "s2":
            return jnp.mean(b) + jnp.mean(s)
        b, s, v, lmk = _stage3(cparams, img, b, s, v, cfg)
        if stop == "s3":
            return jnp.mean(lmk) + jnp.mean(s)
        neg = jnp.finfo(s.dtype).min
        best = jnp.argmax(jnp.where(v, s, neg))
        return lmk[best], s

    def prefix(stop):
        def run(imgs):
            out = jax.vmap(partial(upto, stop=stop))(imgs)
            return jnp.mean(jax.tree.leaves(out)[0])
        return run

    def with_align(imgs, embed):
        lmk, _ = jax.vmap(partial(upto, stop="lmk"))(imgs)
        chips = align_faces(imgs, lmk[:, None], cfg.output_size)[:, 0]
        if not embed:
            return jnp.mean(chips)
        return jnp.mean(embedder.apply(eparams, chips))

    timed("s1", prefix("s1"), x)
    timed("s1+s2", prefix("s2"), x)
    timed("s1+s2+s3", prefix("s3"), x)
    timed("+umeyama+align", partial(with_align, embed=False), x)
    timed("full(+embed)", partial(with_align, embed=True), x)

    # Standalone embed on pre-made chips, same harness, for the delta.
    chips = jax.random.uniform(jax.random.PRNGKey(3),
                               (BATCH, 112, 112, 3), jnp.float32, 0, 255)
    timed("embed_alone", lambda c: jnp.mean(embedder.apply(eparams, c)),
          chips)


if __name__ == "__main__":
    main()
