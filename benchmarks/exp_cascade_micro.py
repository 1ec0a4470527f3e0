"""Cascade-internal prefix attribution: where the 3.37 ms/64 of glue sits.

exp_pipeline_prefix.py attributes the fused pipeline at stage
granularity (s1 0.84 | s2 0.74 | s3 0.50 | umeyama+align 1.29 | embed
4.81 ms/64, round-3 chip session).  This probe opens the stages up:
each prefix ends after one internal step of the cascade (resize+P-Net,
bbox decode, per-scale NMS, merged NMS+select, stage-2 crop, R-Net
tower, stage-2 NMS+select, ...), so consecutive deltas attribute the
*in-fusion* marginal cost of every sub-op.  Same image-threaded
chained harness as the other probes (the carry keeps the loop body
live; ADVICE r3: the input must be data-dependent on the accumulator).

PROFILE=typical (default) or worst selects the budget profile;
BATCH overrides the 256 default.
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import (_crop_dtype, _stage1, align_faces,
                                      pyramid_scales)
from alink_tpu.models import preprocess
from alink_tpu.models.mtcnn import ONet, PNet, RNet
from alink_tpu.ops.boxes import (calibrate_box, clip_to_image,
                                 convert_to_square, generate_bbox,
                                 refine_with_reg, select_topk)
from alink_tpu.ops.image import (affine_warp_batch_pallas, crop_and_resize,
                                 resize)
from alink_tpu.ops.nms import nms, nms_batch
from alink_tpu.ops.umeyama import arcface_template, umeyama

import math

BATCH = int(os.environ.get(
    "BATCH", 256 if jax.default_backend() == "tpu" else 2))
SIZE = 160

_PNET, _RNET, _ONET = PNet(), RNet(), ONet()


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=20):
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
    dt = max(time.perf_counter() - t0 - overhead, 1e-9) / iters
    ms64 = dt * 1000.0 * 64.0 / BATCH
    print(json.dumps({"prefix": name, "ms_per_64": round(ms64, 3)}),
          flush=True)
    return ms64


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    profile = os.environ.get("PROFILE", "typical")
    mk = (CascadeConfig.typical if profile == "typical"
          else CascadeConfig.worst_case)
    cfg = mk(thresholds=(0.0, 0.0, 0.0))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2),
                           (BATCH, SIZE, SIZE, 3), jnp.float32, 0, 255)
    h = w = SIZE
    scales = [s for s in pyramid_scales(h, w, cfg.min_size, cfg.factor)
              if int(math.ceil(h * s)) >= 12 and int(math.ceil(w * s)) >= 12]
    print(json.dumps({"profile": profile, "n_scales": len(scales),
                      "budgets": [cfg.stage1_scale_budget, cfg.stage1_budget,
                                  cfg.stage2_budget, cfg.stage3_budget]}),
          flush=True)

    # One parametric prefix function: stop names an internal cut point.
    def upto(img, stop):
        # --- stage 1 internals (mirrors detect/cascade._stage1) ---
        probs, regs_m = [], []
        for scale in scales:
            sh, sw = int(math.ceil(h * scale)), int(math.ceil(w * scale))
            scaled = resize(img, (sh, sw))
            pr, rg = _PNET.apply(cparams.pnet,
                                 preprocess.mtcnn(scaled)[None])
            probs.append(pr[0, ..., 1])
            regs_m.append(rg[0])
        if stop == "s1_pnet":
            return sum(jnp.mean(p) for p in probs)
        boxes_l, scores_l, regs_l, valid_l = [], [], [], []
        for scale, pm, rm in zip(scales, probs, regs_m):
            b, s, r, v = generate_bbox(pm, rm, scale, cfg.thresholds[0],
                                       cfg.stage1_scale_budget)
            boxes_l.append(b); scores_l.append(s)
            regs_l.append(r); valid_l.append(v)
        if stop == "s1_decode":
            return sum(jnp.mean(b) for b in boxes_l)
        sv = jnp.stack(valid_l)
        keep = nms_batch(jnp.stack(boxes_l), jnp.stack(scores_l), sv, 0.5)
        if stop == "s1_pernms":
            return jnp.mean(keep)
        boxes = jnp.concatenate(boxes_l)
        scores = jnp.concatenate(scores_l)
        regs = jnp.concatenate(regs_l)
        valid = (sv & keep).reshape(-1)
        valid = valid & nms(boxes, scores, valid, 0.7)
        if stop == "s1_gnms":
            return jnp.mean(valid.astype(jnp.float32)) + jnp.mean(boxes)
        boxes = jnp.round(convert_to_square(refine_with_reg(boxes, regs)))
        b, s, v = jax.lax.optimization_barrier(
            select_topk(boxes, scores, valid, cfg.stage1_budget))
        if stop == "s1_select":
            return jnp.mean(b) + jnp.mean(s)
        # --- stage 2 internals ---
        crops = crop_and_resize(img, b, (24, 24), compute_dtype=_crop_dtype(),
                                out_dtype=_crop_dtype())
        if stop == "s2_crop":
            return jnp.mean(crops.astype(jnp.float32)) + jnp.mean(b)
        b = clip_to_image(b, w, h)
        from alink_tpu.detect.cascade import _fenced_tower
        prob, reg = _fenced_tower(_RNET, cparams.rnet, crops)
        if stop == "s2_rnet":
            return jnp.mean(prob) + jnp.mean(b)
        s = prob[:, 1]
        v = v & (s > cfg.thresholds[1])
        v = v & nms(b, s, v, 0.7)
        if stop == "s2_nms":
            return jnp.mean(v.astype(jnp.float32)) + jnp.mean(reg)
        b = jnp.round(convert_to_square(calibrate_box(b, reg)))
        b, s, v = jax.lax.optimization_barrier(
            select_topk(b, s, v, cfg.stage2_budget))
        if stop == "s2_select":
            return jnp.mean(b) + jnp.mean(s)
        # --- stage 3 internals ---
        crops = crop_and_resize(img, b, (48, 48), compute_dtype=_crop_dtype(),
                                out_dtype=_crop_dtype())
        if stop == "s3_crop":
            return jnp.mean(crops.astype(jnp.float32)) + jnp.mean(b)
        b = clip_to_image(b, w, h)
        prob, reg, lmk10 = _fenced_tower(_ONET, cparams.onet, crops)
        if stop == "s3_onet":
            return jnp.mean(prob) + jnp.mean(b)
        s = prob[:, 1]
        v = v & (s > cfg.thresholds[2])
        bw = (b[:, 2] - b[:, 0] + 1.0)[:, None]
        bh = (b[:, 3] - b[:, 1] + 1.0)[:, None]
        lx = b[:, 0:1] + lmk10[:, 0:5] * bw
        ly = b[:, 1:2] + lmk10[:, 5:10] * bh
        lmk = jnp.stack([lx, ly], axis=-1)
        b = calibrate_box(b, reg)
        v = v & nms(b, s, v, 0.7, mode="min")
        b, s, v, lmk = select_topk(b, s, v, cfg.stage3_budget, lmk)
        if stop == "s3_select":
            return jnp.mean(lmk) + jnp.mean(s)
        neg = jnp.finfo(s.dtype).min
        best = jnp.argmax(jnp.where(v, s, neg))
        return lmk[best], s

    def prefix(stop):
        def run(imgs):
            out = jax.vmap(partial(upto, stop=stop))(imgs)
            return jnp.mean(jax.tree.leaves(out)[0])
        return run

    def with_umeyama(imgs, do_warp):
        lmk, _ = jax.vmap(partial(upto, stop="lmk"))(imgs)
        template = arcface_template(cfg.output_size)
        Ms = jax.vmap(lambda l: umeyama(l, template))(lmk)
        if not do_warp:
            return jnp.mean(Ms)
        if jax.default_backend() == "tpu":
            chips = affine_warp_batch_pallas(imgs, Ms, cfg.output_size)
        else:
            from alink_tpu.ops.image import affine_warp_batch
            chips = affine_warp_batch(imgs, Ms, cfg.output_size)
        return jnp.mean(chips)

    stops = ["s1_pnet", "s1_decode", "s1_pernms", "s1_gnms", "s1_select",
             "s2_crop", "s2_rnet", "s2_nms", "s2_select",
             "s3_crop", "s3_onet", "s3_select"]
    prev = 0.0
    deltas = {}
    for st in stops:
        ms = timed(st, prefix(st), x)
        deltas[st] = round(ms - prev, 3)
        prev = ms
    ms = timed("umeyama", partial(with_umeyama, do_warp=False), x)
    deltas["umeyama"] = round(ms - prev, 3)
    prev = ms
    ms = timed("warp", partial(with_umeyama, do_warp=True), x)
    deltas["warp"] = round(ms - prev, 3)
    print(json.dumps({"deltas_ms_per_64": deltas}), flush=True)


if __name__ == "__main__":
    main()
