"""Fine-grained attribution of the cascade's non-embed cost.

Round-1 budget ablation localised ~7.5 ms/64-images to stages 2/3 but
could not split crop traffic from the conv towers from the NMS/top-k
glue (the axon tunnel breaks jax.profiler, BENCHMARKS.md).  This bench
times each component in isolation with the chained-fori_loop pattern so
the channel-packed-tower work targets the real cost.

Components (bench_pipeline.py worst-case budgets, 64 images at 160²):
  crop24   crop_and_resize: 128 boxes/img -> 24² crops
  rnet     RNet tower on the (64*128, 24, 24, 3) crop batch
  crop48   crop_and_resize: 64 boxes/img -> 48² crops
  onet     ONet tower on the (64*64, 48, 48, 3) crop batch
  nms      per-image NMS over the 128-budget + select_topk glue
  umeyama  64 similarity transforms
  warp     Pallas align warp: 64 chips 160² -> 112²
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.detect.cascade import _ONET, _RNET
from alink_tpu.models import preprocess
from alink_tpu.ops.boxes import select_topk
from alink_tpu.ops.image import (affine_warp_batch_pallas, crop_and_resize)
from alink_tpu.ops.nms import nms
from alink_tpu.ops.umeyama import arcface_template, umeyama

BATCH = 64
SIZE = 160
S1_BUDGET = 128
S2_BUDGET = 64


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, *args, iters=30):
    """Chained-iteration timing with n=0 overhead subtraction."""

    @jax.jit
    def chain(n, *a):
        def body(i, carry):
            acc = carry
            out = fn(*a, acc)
            return acc + out
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, *args))  # compile + warm
    t0 = time.perf_counter()
    sync(chain(0, *args))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, *args))
    dt = (time.perf_counter() - t0 - overhead) / iters * 1000.0
    print(json.dumps({"component": name, "ms_per_64imgs": round(dt, 3)}),
          flush=True)
    return dt


def rand_boxes(key, n, k, lo=8.0, hi=140.0):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n, k, 2), jnp.float32, 0.0, SIZE - hi)
    wh = jax.random.uniform(k2, (n, k, 2), jnp.float32, lo, hi)
    return jnp.concatenate([xy, xy + wh], axis=-1)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32,
                              0.0, 255.0)
    boxes1 = rand_boxes(jax.random.PRNGKey(1), BATCH, S1_BUDGET)
    boxes2 = rand_boxes(jax.random.PRNGKey(2), BATCH, S2_BUDGET)
    scores1 = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, S1_BUDGET))
    valid1 = jnp.ones((BATCH, S1_BUDGET), bool)

    rparams = _RNET.init(jax.random.PRNGKey(4), jnp.zeros((1, 24, 24, 3)))
    oparams = _ONET.init(jax.random.PRNGKey(5), jnp.zeros((1, 48, 48, 3)))
    crops24 = jax.random.uniform(jax.random.PRNGKey(6),
                                 (BATCH * S1_BUDGET, 24, 24, 3),
                                 jnp.float32, 0.0, 255.0)
    crops48 = jax.random.uniform(jax.random.PRNGKey(7),
                                 (BATCH * S2_BUDGET, 48, 48, 3),
                                 jnp.float32, 0.0, 255.0)

    lmk = jax.random.uniform(jax.random.PRNGKey(8), (BATCH, 5, 2),
                             jnp.float32, 30.0, 130.0)
    template = arcface_template((112, 112))

    bf16 = jnp.bfloat16 if jax.default_backend() == "tpu" else None

    def crop24(imgs, boxes, acc):
        c = jax.vmap(lambda im, b: crop_and_resize(
            im, b, (24, 24), compute_dtype=bf16))(imgs + 0.0 * acc, boxes)
        return jnp.mean(c)

    def rnet(p, x, acc):
        prob, reg = _RNET.apply(p, preprocess.mtcnn(x + 0.0 * acc))
        return jnp.mean(prob) + jnp.mean(reg)

    def crop48(imgs, boxes, acc):
        c = jax.vmap(lambda im, b: crop_and_resize(
            im, b, (48, 48), compute_dtype=bf16))(imgs + 0.0 * acc, boxes)
        return jnp.mean(c)

    def onet(p, x, acc):
        prob, reg, l = _ONET.apply(p, preprocess.mtcnn(x + 0.0 * acc))
        return jnp.mean(prob) + jnp.mean(reg) + jnp.mean(l)

    def nms_glue(boxes, scores, valid, acc):
        def one(b, s, v):
            keep = v & nms(b, s + 0.0 * acc, v, 0.7)
            bb, ss, vv = select_topk(b, s, keep, S2_BUDGET)
            return jnp.mean(bb) + jnp.mean(ss)
        return jnp.mean(jax.vmap(one)(boxes, scores, valid))

    def umey(lmk, acc):
        Ms = jax.vmap(lambda l: umeyama(l + 0.0 * acc, template))(lmk)
        return jnp.mean(Ms)

    def warp(imgs, lmk, acc):
        Ms = jax.vmap(lambda l: umeyama(l, template))(lmk + 0.0 * acc)
        chips = affine_warp_batch_pallas(imgs, Ms, (112, 112))
        return jnp.mean(chips)

    timed("crop24_128box", crop24, imgs, boxes1)
    timed("rnet_8192", rnet, rparams, crops24)
    timed("crop48_64box", crop48, imgs, boxes2)
    timed("onet_4096", onet, oparams, crops48)
    timed("nms_topk_128", nms_glue, boxes1, scores1, valid1)
    timed("umeyama_64", umey, lmk)
    timed("umeyama+warp_64", warp, imgs, lmk)


if __name__ == "__main__":
    main()
