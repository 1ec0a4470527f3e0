"""Sub-stage ablation of the cascade at typical budgets (batch 256, 160²).

The r50 pipeline budget (BENCHMARKS.md "Round-3") puts 2.08 ms/64 in
the three MTCNN stages while their conv towers are near-free — this
times each stage's internals as separate chained programs so the glue
(resize, decode top_k, NMS, select_topk, crops, towers) is attributed
at the shapes the typical profile actually runs.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import (_ONET, _PNET, _RNET, _stage1, _stage2,
                                      pyramid_scales)
from alink_tpu.models import preprocess
from alink_tpu.ops.boxes import generate_bbox, select_topk
from alink_tpu.ops.image import crop_and_resize, resize
from alink_tpu.ops.nms import nms, nms_batch

BATCH = 256 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=30):
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
    ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = max(time.perf_counter() - t0 - ov, 1e-9) / iters
    print(json.dumps({"part": name,
                      "ms_per_64": round(dt * 1e3 * 64 / BATCH, 3)}),
          flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    params = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2),
                           (BATCH, SIZE, SIZE, 3), jnp.float32, 0, 255)
    h = w = SIZE
    scales = [s for s in pyramid_scales(h, w, cfg.min_size, cfg.factor)
              if int(-(-h * s // 1)) >= 12]
    print(json.dumps({"scales": [round(s, 4) for s in scales]}), flush=True)

    # --- stage 1 internals -------------------------------------------------
    import math
    dims = [(int(math.ceil(h * s)), int(math.ceil(w * s))) for s in scales]

    def s1_resize(img):
        return tuple(resize(img, d) for d in dims)

    timed("s1_resizes", lambda im: jax.vmap(s1_resize)(im), x)

    def s1_towers(img):
        outs = []
        for d in dims:
            scaled = resize(img, d)
            outs.append(_PNET.apply(params.pnet,
                                    preprocess.mtcnn(scaled)[None]))
        return tuple(jnp.mean(p) + jnp.mean(r) for p, r in outs)

    timed("s1_resize+towers", lambda im: jax.vmap(s1_towers)(im), x)

    def s1_decode(img):
        bl, sl, rl, vl = [], [], [], []
        for scale, d in zip(scales, dims):
            scaled = resize(img, d)
            prob, reg = _PNET.apply(params.pnet,
                                    preprocess.mtcnn(scaled)[None])
            b, s, r, v = generate_bbox(prob[0, ..., 1], reg[0], scale,
                                       cfg.thresholds[0],
                                       cfg.stage1_scale_budget)
            bl.append(b), sl.append(s), rl.append(r), vl.append(v)
        return jnp.stack(bl), jnp.stack(sl), jnp.stack(rl), jnp.stack(vl)

    timed("s1_+decode_topk", lambda im: jax.vmap(s1_decode)(im), x)

    def s1_full(img):
        return _stage1(params, img, cfg, h, w)

    timed("s1_full", lambda im: jax.vmap(s1_full)(im), x)

    # --- stage 2 internals (on fixed stage-1 output shapes) ---------------
    def s1_out(img):
        return _stage1(params, img, cfg, h, w)

    b0, s0, v0 = jax.vmap(s1_out)(x)
    b0 = jax.block_until_ready(b0)

    def s2_crop(img_b):
        img, b = img_b[0], img_b[1]
        return crop_and_resize(img, b, (24, 24),
                               compute_dtype=jnp.bfloat16)

    def run_s2_crop(im):
        return jax.vmap(lambda i, b: crop_and_resize(
            i, b, (24, 24), compute_dtype=jnp.bfloat16))(im, b0)

    timed("s2_crops", run_s2_crop, x)

    def run_s2_tower(im):
        crops = jax.vmap(lambda i, b: crop_and_resize(
            i, b, (24, 24), compute_dtype=jnp.bfloat16))(im, b0)
        flat = crops.reshape(-1, 24, 24, 3)
        prob, reg = _RNET.apply(params.rnet, preprocess.mtcnn(flat))
        return jnp.mean(prob) + jnp.mean(reg)

    timed("s2_crops+tower", run_s2_tower, x)

    def run_s2_full(im):
        return jax.vmap(lambda i, b, s, v: _stage2(params, i, b, s, v, cfg)
                        )(im, b0, s0, v0)

    timed("s2_full", run_s2_full, x)

    # --- NMS / select at stage-1 merged shapes -----------------------------
    nc = len(scales) * cfg.stage1_scale_budget
    bb = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, nc, 4),
                            jnp.float32, 0, 160)
    ss = jax.random.uniform(jax.random.PRNGKey(4), (BATCH, nc))
    vv = jnp.ones((BATCH, nc), bool)

    timed("nms_merged", lambda b: jax.vmap(
        lambda bi, si, vi: nms(bi, si, vi, 0.7))(b, ss, vv), bb)
    timed("select_topk_merged", lambda b: jax.vmap(
        lambda bi, si, vi: select_topk(bi, si, vi, cfg.stage1_budget)
    )(b, ss, vv), bb)


if __name__ == "__main__":
    main()
