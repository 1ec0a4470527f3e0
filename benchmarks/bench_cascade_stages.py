"""Direct timing of the cascade's real stage functions (not proxies).

Measures jit(vmap(_stage1)), then cumulative stage1+2, +3, +align, and
the full pipeline, at both budget profiles — the ground truth for where
detect->align->embed time goes.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect.cascade import (CascadeConfig, _stage1, _stage2,
                                      _stage3, align_faces,
                                      init_cascade_params)
from alink_tpu.detect.face_model import FaceModel
from alink_tpu.models import ArcFaceResNet100

BATCH, SIZE = 64, 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=30):
    @jax.jit
    def chain(n, x):
        def body(i, acc):
            out = fn(x + (0.0 * acc).astype(x.dtype))
            return acc + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, x))
    t0 = time.perf_counter()
    sync(chain(0, x))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, x))
    dt = (time.perf_counter() - t0 - ovh) / iters * 1e3
    print(json.dumps({"path": name, "ms_per_64": round(dt, 3)}), flush=True)
    return dt


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    params = init_cascade_params(jax.random.PRNGKey(1))
    imgs = jax.random.uniform(jax.random.PRNGKey(2),
                              (BATCH, SIZE, SIZE, 3), jnp.float32, 0, 255)
    h = w = SIZE

    embedder = ArcFaceResNet100()
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))

    for profile, cfg in (
        ("worst", CascadeConfig(thresholds=(0.0, 0.0, 0.0),
                                stage1_scale_budget=64, stage1_budget=128,
                                stage2_budget=64, stage3_budget=16)),
        ("typical", CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))),
    ):
        def s1(im):
            b, s, v = jax.vmap(
                lambda g: _stage1(params, g, cfg, h, w))(im)
            return jnp.mean(b) + jnp.mean(s)

        def s12(im):
            def one(g):
                b, s, v = _stage1(params, g, cfg, h, w)
                b, s, v = _stage2(params, g, b, s, v, cfg)
                return jnp.mean(b) + jnp.mean(s)
            return jnp.mean(jax.vmap(one)(im))

        def s123(im):
            def one(g):
                b, s, v = _stage1(params, g, cfg, h, w)
                b, s, v = _stage2(params, g, b, s, v, cfg)
                b, s, v, l = _stage3(params, g, b, s, v, cfg)
                return jnp.mean(b) + jnp.mean(l)
            return jnp.mean(jax.vmap(one)(im))

        fm = FaceModel(eparams, params, cfg, embedder=embedder)

        def full(im):
            return jnp.mean(fm.pipeline(eparams, params, im))

        def detect_align(im):
            det_boxes = jax.vmap(lambda g: _det_align(g))(im)
            return jnp.mean(det_boxes)

        def _det_align(g):
            b, s, v = _stage1(params, g, cfg, h, w)
            b, s, v = _stage2(params, g, b, s, v, cfg)
            b, s, v, l = _stage3(params, g, b, s, v, cfg)
            neg = jnp.finfo(s.dtype).min
            best = jnp.argmax(jnp.where(v, s, neg))
            chip = align_faces(g[None], l[best][None, None])
            return jnp.mean(chip)

        timed(f"{profile}_stage1", s1, imgs)
        timed(f"{profile}_stage12", s12, imgs)
        timed(f"{profile}_stage123", s123, imgs)
        timed(f"{profile}_det_align", detect_align, imgs)
        timed(f"{profile}_full_pipeline", full, imgs)


if __name__ == "__main__":
    main()
