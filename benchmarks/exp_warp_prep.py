"""Attribute and fix the align-warp's per-batch prep/post relayout cost.

The 0.913 ms/64 round-2 kernel number was measured with the *transforms*
threaded through the timing carry and the image loop-invariant — so the
f32->bf16 cast + channel-pad 3->4 + (n,h,w*c4) reshape (a lane-granularity
relayout, one of the slowest op classes on TPU) was hoisted out of the
loop.  In the pipeline the image is fresh every batch, so align_faces
really costs ~2.4 ms/64.  Candidate fix: build the padded layout on the
MXU — reshape to (n*h, w*c) and multiply by a constant 0/1 (w*c, w*c4)
scatter matrix (pixels may ride bf16; they are not coordinates).  Same
trick for the output's 4->3 lane unpad.
"""

import json
import time
from functools import partial

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
    def chain(im, n):
        def body(i, carry):
            a, acc = carry
            out = fn(a)
            return a + 0.0 * acc, acc + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (im, jnp.float32(0.0)))[1]

    sync(chain(x, 2))
    t0 = time.perf_counter(); sync(chain(x, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ov) / iters * 1000.0
    print(json.dumps({"variant": name, "ms_per_64": round(dt, 3)}),
          flush=True)
    return dt


def prep_pad(img):
    n, h, w, c = img.shape
    c4 = 4
    x = jnp.pad(img.astype(jnp.bfloat16),
                ((0, 0), (0, 0), (0, 0), (0, c4 - c)))
    return x.reshape(n, h, w * c4)


def prep_mm(img):
    n, h, w, c = img.shape
    c4 = 4
    # (w*c, w*c4) 0/1 scatter: column w*c4q + r reads row w*cq + r (r < c).
    src = jax.lax.broadcasted_iota(jnp.int32, (w * c, w * c4), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (w * c, w * c4), 1)
    scatter = ((dst // c4 == src // c) & (dst % c4 == src % c)
               ).astype(jnp.bfloat16)
    flat = img.reshape(n * h, w * c).astype(jnp.bfloat16)
    return jnp.dot(flat, scatter,
                   preferred_element_type=jnp.bfloat16).reshape(n, h, w * c4)


def post_slice(y):
    n = y.shape[0]
    oh, ow = OUT
    return y[:, : oh * ow, :3].reshape(n, oh, ow, 3).astype(jnp.float32)


def post_mm(y):
    n = y.shape[0]
    oh, ow = OUT
    # fold (P, 4) lanes -> (P, 3) via 0/1 matmul on f32 (y is f32).
    fold = (jax.lax.broadcasted_iota(jnp.int32, (4, 3), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (4, 3), 1)
            ).astype(jnp.float32)
    z = jnp.dot(y[:, : oh * ow].reshape(n * oh * ow, 4), fold,
                preferred_element_type=jnp.float32)
    return z.reshape(n, oh, ow, 3)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (N, SIZE, SIZE, 3), jnp.float32, 0, 255)
    lmk = jax.random.uniform(jax.random.PRNGKey(1), (N, 5, 2),
                             jnp.float32, 30.0, 130.0)
    tmpl = arcface_template(OUT)
    Ms = jax.vmap(lambda l: umeyama(l, tmpl))(lmk)

    # parity of the matmul prep vs the pad prep
    a = jax.jit(prep_pad)(imgs)
    b = jax.jit(prep_mm)(imgs)
    print(json.dumps({"check": "prep", "max_err":
                      float(jnp.max(jnp.abs((a - b).astype(jnp.float32))))}),
          flush=True)

    timed("prep_pad", prep_pad, imgs)
    timed("prep_mm", prep_mm, imgs)
    timed("warp_im_threaded", lambda im: affine_warp_batch_pallas(im, Ms,
                                                                  OUT),
          imgs)
    y = jax.jit(lambda im: affine_warp_batch_pallas(im, Ms, OUT))(imgs)
    y4 = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 1))).reshape(N, -1, 4)
    timed("post_slice", post_slice, y4)
    timed("post_mm", post_mm, y4)


if __name__ == "__main__":
    main()
