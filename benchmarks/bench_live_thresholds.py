"""Pipeline cost with LIVE thresholds and partially-empty budgets.

VERDICT r3 #7: the headline bench measures thresholds=(0,0,0) — every
budget slot valid, the per-budget worst case.  This probe re-runs the
same fused r50 pipeline with the reference's real thresholds
(0.6, 0.7, 0.8 — code/mtcnn_detector.py:28) so validity masks are
partially empty, and also times the ``pipeline_valid`` variant (the
per-image found-mask path).  Expected: static shapes make the cost
threshold-independent (every budget slot is cropped/towered whether
valid or not), so live ≈ worst-case within noise — this probe is the
measurement that confirms the headline number brackets real workloads.

Also reports the per-stage surviving-candidate statistics under the
live thresholds (profile_cascade) so the partially-empty claim is
itself measured, not assumed.
"""

import json
import time

import jax
import jax.numpy as jnp

BATCH = 256 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(fn, x, iters=20):
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
    return max(time.perf_counter() - t0 - overhead, 1e-9) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
    from alink_tpu.detect.cascade import profile_cascade

    if jax.default_backend() == "tpu":
        from alink_tpu.models import ArcFaceResNet50
        embedder = ArcFaceResNet50()
    else:
        from alink_tpu.models import ArcFaceResNet100
        embedder = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3),
                           jnp.float32, 0.0, 255.0)

    results = {}
    worst = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    live = CascadeConfig.typical()  # reference thresholds (0.6, 0.7, 0.8)
    for name, cfg in (("worst_thresholds_000", worst),
                      ("live_thresholds_678", live)):
        fm = FaceModel(eparams, cparams, cfg, embedder=embedder)
        sec = timed(lambda im: fm.pipeline(eparams, cparams, im), x)
        results[name + "_faces_per_sec"] = round(BATCH / sec, 1)
    # pipeline_valid: the found-mask path, live thresholds.
    fm = FaceModel(eparams, cparams, live, embedder=embedder)
    sec = timed(lambda im: fm.pipeline_valid(eparams, cparams, im)[0], x)
    results["live_pipeline_valid_faces_per_sec"] = round(BATCH / sec, 1)

    # Candidate survival under live thresholds (random weights): the
    # "partially empty budgets" evidence.
    prof = profile_cascade(cparams, x[:64], live)
    for k, v in prof.items():
        arr = jnp.asarray(v)
        results[f"live_{k}_mean"] = round(float(jnp.mean(arr)), 2)
        results[f"live_{k}_max"] = int(jnp.max(arr))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
