"""Diagnose the align-warp cost inside the pipeline profile.

The standalone warp bench (bench_warp.py) measures the banded-K kernel at
0.91 ms/64 for sane face-crop transforms, but profile_pipeline.py sees
~2.6 ms.  Suspect: random cascade weights emit degenerate landmarks
(near-coincident points) whose Umeyama fit has a huge scale, so every
tile takes the out-of-band full-height overwrite path.  This script
measures the warp with (a) the cascade's landmarks under random weights
and (b) template-like landmarks with realistic jitter, and prints the
fitted-scale stats for both.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import align_faces, detect_faces
from alink_tpu.ops.umeyama import arcface_template, umeyama


def _sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(fn, *args, iters=30):
    @jax.jit
    def chain(a0, n):
        def body(i, carry):
            im, acc = carry
            out = fn(im, *args[1:])
            return im + 0.0 * acc, acc + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0.0)))[1]

    _sync(chain(args[0], 2))
    t0 = time.perf_counter(); _sync(chain(args[0], 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter(); _sync(chain(args[0], iters))
    return (time.perf_counter() - t0 - ov) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    batch, size = 64, 160
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3),
                           jnp.float32, 0, 255)

    det = jax.jit(lambda im: detect_faces(cparams, im, cfg))(x)
    neg = jnp.finfo(det.scores.dtype).min
    best = jnp.argmax(jnp.where(det.valid, det.scores, neg), axis=1)
    blmk = jax.vmap(lambda l, b: l[b])(det.landmarks, best)[:, None]

    tmpl = arcface_template((112, 112))
    # Realistic landmarks: template geometry placed in the frame with
    # scale/offset/jitter like a real detection would produce.
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    sc = jax.random.uniform(k1, (batch, 1, 1), jnp.float32, 0.8, 1.3)
    off = jax.random.uniform(k2, (batch, 1, 2), jnp.float32, 5.0, 40.0)
    jit_ = jax.random.normal(k3, (batch, 5, 2)) * 1.5
    sane = (tmpl[None] * sc + off + jit_)[:, None]

    out = {}
    for name, lmk in (("cascade_random_weights", blmk), ("sane", sane)):
        Ms = jax.vmap(lambda l: umeyama(l[0], tmpl))(lmk)
        s = jnp.sqrt(Ms[:, 0, 0] ** 2 + Ms[:, 1, 0] ** 2)
        out[f"{name}_scale_minmax"] = [round(float(s.min()), 3),
                                       round(float(s.max()), 3)]
        out[f"{name}_warp_ms"] = round(
            timed(lambda im, l: align_faces(im, l, (112, 112)), x, lmk)
            * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
