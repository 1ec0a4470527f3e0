"""Knockout attribution inside the P-Net stage (typical profile).

Stage 1 measures ~1.8-1.9 ms/64 images while its towers, top-ks and
resizes each measure near zero in isolation — this re-implements
_stage1 with switchable pieces to find the real cost in context.
Variants (cumulative work, same shapes throughout):
  towers       resize + P-Net forwards only
  +decode      ... + generate_bbox (top_k per scale)
  +scale_nms   ... + per-scale NMS 0.5
  +global_nms  ... + merged NMS 0.7
  full         ... + refine/square/round + select_topk (== _stage1)
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect.cascade import (CascadeConfig, _PNET, pyramid_scales)
from alink_tpu.models import preprocess
from alink_tpu.ops.boxes import (convert_to_square, generate_bbox,
                                 refine_with_reg, select_topk)
from alink_tpu.ops.image import resize
from alink_tpu.ops.nms import nms, nms_batch
import math

BATCH, SIZE = 64, 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=40):
    @jax.jit
    def chain(n, x):
        def body(i, acc):
            out = fn(x + (0.0 * acc).astype(x.dtype))
            return acc + out.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, x))
    t0 = time.perf_counter()
    sync(chain(0, x))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, x))
    dt = (time.perf_counter() - t0 - ovh) / iters * 1e3
    print(json.dumps({"variant": name, "ms_per_64": round(dt, 3)}),
          flush=True)


def make_stage1(params, cfg, h, w, upto):
    scales = pyramid_scales(h, w, cfg.min_size, cfg.factor)

    def single(img):
        boxes_l, scores_l, regs_l, valid_l = [], [], [], []
        acc = jnp.float32(0.0)
        for scale in scales:
            sh, sw = int(math.ceil(h * scale)), int(math.ceil(w * scale))
            if sh < 12 or sw < 12:
                continue
            scaled = resize(img, (sh, sw))
            prob, reg = _PNET.apply(params.pnet,
                                    preprocess.mtcnn(scaled)[None])
            if upto == "towers":
                acc = acc + jnp.mean(prob.astype(jnp.float32))
                continue
            b, s, r, v = generate_bbox(
                prob[0, ..., 1], reg[0], scale, cfg.thresholds[0],
                cfg.stage1_scale_budget)
            boxes_l.append(b)
            scores_l.append(s)
            regs_l.append(r)
            valid_l.append(v)
        if upto == "towers":
            return acc
        boxes = jnp.concatenate(boxes_l)
        scores = jnp.concatenate(scores_l)
        regs = jnp.concatenate(regs_l)
        stacked_valid = jnp.stack(valid_l)
        if upto == "decode":
            return jnp.mean(boxes) + jnp.mean(scores)
        keep = nms_batch(jnp.stack(boxes_l), jnp.stack(scores_l),
                         stacked_valid, 0.5)
        valid = (stacked_valid & keep).reshape(-1)
        if upto == "scale_nms":
            return jnp.mean(valid.astype(jnp.float32)) + jnp.mean(boxes)
        valid = valid & nms(boxes, scores, valid, 0.7)
        if upto == "global_nms":
            return jnp.mean(valid.astype(jnp.float32)) + jnp.mean(boxes)
        boxes = refine_with_reg(boxes, regs)
        boxes = convert_to_square(boxes)
        boxes = jnp.round(boxes)
        b, s, v = select_topk(boxes, scores, valid, cfg.stage1_budget)
        return jnp.mean(b) + jnp.mean(s)

    def run(imgs):
        return jnp.mean(jax.vmap(single)(imgs))
    return run


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from alink_tpu.detect.cascade import init_cascade_params
    params = init_cascade_params(jax.random.PRNGKey(1))
    imgs = jax.random.uniform(jax.random.PRNGKey(2),
                              (BATCH, SIZE, SIZE, 3), jnp.float32, 0, 255)
    for profile, cfg in (
        ("typ20", CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0),
                                        min_size=20)),
        ("typ40", CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))),
    ):
        for upto in ("towers", "decode", "scale_nms", "global_nms",
                     "full"):
            timed(f"{profile}_{upto}",
                  make_stage1(params, cfg, SIZE, SIZE, upto), imgs)


if __name__ == "__main__":
    main()
