"""A/B: warp-input fence in the fused r34 pipeline (the 10k decider).

The in-pipeline warp attribution runs ~0.25 ms/64 over the kernel's
standalone cost; a fence on (imgs, Ms) at the align boundary targets
exactly that.  Times FaceModel.pipeline with fence on/off, interleaved
twice to cancel tunnel drift.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import align_faces, detect_faces
from alink_tpu.models import ArcFaceResNet34

BATCH = 256 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def make_pipeline(emb, ep, cp, cfg, fence):
    def pipeline(images):
        det = detect_faces(cp, images, cfg)
        neg = jnp.finfo(det.scores.dtype).min
        best = jnp.argmax(jnp.where(det.valid, det.scores, neg), axis=1)
        found = jnp.any(det.valid, axis=1)
        lmk = jax.vmap(lambda l, b: l[b])(det.landmarks, best)
        chips = align_faces(images, lmk[:, None], cfg.output_size,
                            fence=fence)
        chips = jax.lax.optimization_barrier(chips)
        chips = jnp.where(found[:, None, None, None], chips[:, 0], 0.0)
        return emb.apply(ep, chips)
    return pipeline


def timed(fn, x, iters=20):
    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            out = jnp.mean(fn(im).astype(jnp.float32))
            return im + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    sync(chain(x, 1))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    return (time.perf_counter() - t0 - ovh) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    emb = ArcFaceResNet34()
    ep = emb.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    cp = init_cascade_params(jax.random.PRNGKey(1))
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3),
                           jnp.float32, 0.0, 255.0)
    fns = {f"fence_{f}": make_pipeline(emb, ep, cp, cfg, f)
           for f in (True, False)}
    # Interleave rounds to cancel tunnel drift.
    for rnd in range(2):
        for name, fn in fns.items():
            dt = timed(fn, x)
            print(json.dumps({"round": rnd, "case": name,
                              "faces_per_sec": round(BATCH / dt, 1),
                              "ms_per_64": round(dt * 1000 * 64 / BATCH, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
