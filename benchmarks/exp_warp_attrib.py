"""Isolate where align-warp time goes when the image changes per call.

Rows:
  identity_add      im + 1.0 (im threaded)    — the timing-harness floor
                    for a fresh (64,160,160,3) f32 batch each iteration
  warp_im           shipped warp, im threaded — what the pipeline pays
  warp_ms           shipped warp, Ms threaded — the round-2 commit's
                    measurement convention (image loop-invariant)
  pallas_only_im4   _banded_warp_call on pre-built (n,h,wc) bf16 inputs,
                    imgs4 threaded — the kernel cost alone

Landmarks are face-shaped (template*scale+offset+jitter) so the banded
fast path is active; scales land in [0.75, 1.3].
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.ops.image import (_band_offsets, _banded_warp_call, _inv2x2,
                                 affine_warp_batch_pallas)
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
            return a + 0.0 * acc, acc + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0.0)))[1]

    sync(chain(x, 2))
    t0 = time.perf_counter(); sync(chain(x, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ov) / iters * 1000.0
    print(json.dumps({"variant": name, "ms_per_64": round(dt, 3)}),
          flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (N, SIZE, SIZE, 3),
                              jnp.float32, 0, 255)
    tmpl = arcface_template(OUT)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    sc = jax.random.uniform(k1, (N, 1, 1), jnp.float32, 0.8, 1.3)
    off = jax.random.uniform(k2, (N, 1, 2), jnp.float32, 5.0, 40.0)
    jit_ = jax.random.normal(k3, (N, 5, 2)) * 1.5
    lmk = tmpl[None] * sc + off + jit_
    Ms = jax.vmap(lambda l: umeyama(l, tmpl))(lmk)

    timed("identity_add", lambda im: im + 1.0, imgs)
    timed("warp_im", lambda im: affine_warp_batch_pallas(im, Ms, OUT), imgs)
    timed("warp_ms", lambda m: affine_warp_batch_pallas(imgs, m, OUT), Ms)

    # kernel-only: pre-build the padded layout + scalars outside the loop
    c4, band = 4, 128
    wc = -(-(SIZE * c4) // 128) * 128
    imgs4 = jnp.pad(imgs.astype(jnp.bfloat16),
                    ((0, 0), (0, 0), (0, 0), (0, 1))).reshape(N, SIZE, wc)
    Ainv = _inv2x2(Ms[:, :, :2].astype(jnp.float32))
    bvec = Ms[:, :, 2].astype(jnp.float32)
    scal = jnp.concatenate([Ainv.reshape(N, 4), bvec], axis=1)
    bytes_per_px = 6 * band + 5 * wc
    tile_px = max(OUT[1], min(2048, (8 << 20) // bytes_per_px))
    rpt = max(1, min(OUT[0], tile_px // OUT[1]))
    ylo = _band_offsets(Ainv, bvec, OUT, rpt, band, SIZE, "zero")
    n_over = int((ylo < 0).sum())
    print(json.dumps({"overflow_tiles": n_over,
                      "total_tiles": int(ylo.size)}), flush=True)
    timed("pallas_only_im4",
          lambda a: _banded_warp_call(a, scal, ylo, OUT, band, rpt,
                                      SIZE, SIZE, c4, "zero", False),
          imgs4)


if __name__ == "__main__":
    main()
