"""Per-stage wall-clock profile of the detect->align->embed pipeline.

Times each stage as its own fori_loop-chained jit (same amortisation
pattern as bench_pipeline.py) so stage costs can be compared on the real
chip; used to direct optimisation work, not a headline benchmark.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.detect.cascade import (_stage1, _stage2, _stage3, align_faces,
                                      detect_faces)
from alink_tpu.models import ArcFaceResNet100
from alink_tpu.ops.umeyama import arcface_template, umeyama


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(fn, *args, iters=20):
    """Chain `iters` calls of fn inside one jit; subtract dispatch latency.

    The first (float) argument is perturbed by the carry each iteration so
    XLA cannot hoist the loop-invariant computation out of the chain.
    """

    @jax.jit
    def chain(n, a0, *rest):
        def body(i, carry):
            x, acc = carry
            out = jnp.mean(
                jax.tree.leaves(fn(x, *rest))[0].astype(jnp.float32))
            return x + 0.0 * out, acc + out * 1e-6
        return jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0.0)))[1]

    sync(chain(1, *args))
    t0 = time.perf_counter()
    sync(chain(0, *args))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, *args))
    return max(time.perf_counter() - t0 - overhead, 1e-9) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    batch = 64
    size = 160
    # The headline profile (bench.py / CascadeConfig.typical); override
    # via PROFILE=legacy for the round-1 intermediate budgets.
    import os
    if os.environ.get("PROFILE") == "legacy":
        cfg = CascadeConfig(
            thresholds=(0.0, 0.0, 0.0),
            stage1_scale_budget=64,
            stage1_budget=128,
            stage2_budget=64,
            stage3_budget=16,
        )
    else:
        cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    if os.environ.get("EMBEDDER") == "r50":
        from alink_tpu.models import ArcFaceResNet50
        embedder = ArcFaceResNet50()
    else:
        embedder = ArcFaceResNet100()
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3),
                           jnp.float32, 0.0, 255.0)
    h, w = size, size

    s1 = jax.vmap(lambda im: _stage1(cparams, im, cfg, h, w))
    b1, sc1, v1 = jax.jit(s1)(x)
    s2 = jax.vmap(lambda im, b, s, v: _stage2(cparams, im, b, s, v, cfg))
    b2, sc2, v2 = jax.jit(s2)(x, b1, sc1, v1)
    s3 = jax.vmap(lambda im, b, s, v: _stage3(cparams, im, b, s, v, cfg))
    b3, sc3, v3, lmk = jax.jit(s3)(x, b2, sc2, v2)

    best = jnp.argmax(jnp.where(v3, sc3, -1e30), axis=1)
    blmk = jax.vmap(lambda l, b: l[b])(lmk, best)[:, None]

    template = arcface_template((112, 112))
    um = lambda lm: jax.vmap(lambda l: umeyama(l[0], template))(lm)
    warp = lambda im, lm: align_faces(im, lm, (112, 112))
    chips = jax.jit(warp)(x, blmk)
    embed = lambda c: embedder.apply(eparams, c[:, 0])

    from alink_tpu.detect import FaceModel
    fm = FaceModel(eparams, cparams, cfg, embedder=embedder)
    whole = lambda im: fm.pipeline(eparams, cparams, im)

    out = {
        "stage1_pnet_ms": round(timed(s1, x) * 1e3, 2),
        "stage2_rnet_ms": round(timed(s2, x, b1, sc1, v1) * 1e3, 2),
        "stage3_onet_ms": round(timed(s3, x, b2, sc2, v2) * 1e3, 2),
        "umeyama_ms": round(timed(um, blmk) * 1e3, 2),
        "align_warp_ms": round(timed(warp, x, blmk) * 1e3, 2),
        "embed_ms": round(timed(embed, chips) * 1e3, 2),
    }
    # The fused whole-pipeline program vs the sum of its stages: the gap
    # is inter-stage fusion/copy overhead the per-stage rows can't see.
    out["whole_pipeline_ms"] = round(timed(whole, x) * 1e3, 2)
    out["stage_sum_ms"] = round(sum(
        v for k, v in out.items() if k.endswith("_ms")
        and k != "whole_pipeline_ms"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
