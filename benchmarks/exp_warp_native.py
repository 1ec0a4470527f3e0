"""End-to-end align-warp timing from raw (n, h, w, 3) f32 frames.

Times the SHIPPED native-layout warp (`ops/image.affine_warp_batch_pallas`
— round 3: f32 native-lane input with no relayout prep, per-slice fold
matrices, divisor-snapped row tiles) on the alignment workload, with the
image threaded through the timing carry (the pipeline's reality — an
image held loop-invariant lets XLA hoist input prep and under-reports;
see BENCHMARKS.md "Measurement correction").

Variants:
  aligns_e2e     64 sane face-alignment transforms (banded path, zero
                 overflow tiles)
  overflow_e2e   64 large rotations (every tile takes the pl.when
                 full-height fallback — the worst case)
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.ops.image import affine_warp_batch_pallas
from alink_tpu.ops.umeyama import arcface_template, umeyama

N, SIZE = 64, 160
OUT = (112, 112)


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=50):
    @jax.jit
    def chain(a0, n):
        def body(i, carry):
            a, acc = carry
            out = fn(a)
            return a + (0.0 * acc).astype(a.dtype), \
                acc + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0.0)))[1]

    sync(chain(x, 2))
    t0 = time.perf_counter(); sync(chain(x, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ov) / iters * 1000.0
    print(json.dumps({"variant": name, "ms_per_64": round(dt, 3)}),
          flush=True)
    return dt


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (N, SIZE, SIZE, 3),
                              jnp.float32, 0.0, 255.0)
    tmpl = arcface_template(OUT)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    sc = jax.random.uniform(k1, (N, 1, 1), jnp.float32, 0.8, 1.3)
    off = jax.random.uniform(k2, (N, 1, 2), jnp.float32, 5.0, 40.0)
    jit_ = jax.random.normal(k3, (N, 5, 2)) * 1.5
    sane = tmpl[None] * sc + off + jit_
    Ms = jax.vmap(lambda l: umeyama(l, tmpl))(sane)

    timed("aligns_e2e",
          lambda z: affine_warp_batch_pallas(z, Ms, OUT), imgs)

    # ~60 degree rotations: tap spans blow the 128-row band on most
    # tiles, forcing the exact full-height fallback.
    th = jax.random.uniform(k3, (N,), jnp.float32, 0.9, 1.2)
    cth, sth = jnp.cos(th), jnp.sin(th)
    rot = jnp.stack(
        [jnp.stack([cth, -sth, jnp.full((N,), 80.0)], -1),
         jnp.stack([sth, cth, jnp.full((N,), -20.0)], -1)], axis=1)
    timed("overflow_e2e",
          lambda z: affine_warp_batch_pallas(z, rot, OUT), imgs)


if __name__ == "__main__":
    main()
