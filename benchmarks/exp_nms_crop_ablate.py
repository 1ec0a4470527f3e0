"""Micro-ablation of the two measured glue hotspots (exp_stage_glue.py):

  stage-1:  0.70 ms/64 where towers+decode are 0.08 -> the NMS passes
  stage-2:  0.72 ms/64 where crops alone are 0.66   -> crop_and_resize

Times each sub-computation as a chained program at the exact shapes the
typical profile runs (batch 256, 160^2, budgets 32/32/8/4), so the next
optimization targets the real term, not a guess.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.ops.image import crop_and_resize
from alink_tpu.ops.nms import iou_matrix, nms

BATCH = 256 if jax.default_backend() == "tpu" else 4
NC = 160  # stage-1 merged candidates: 5 scales x 32


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, carrier, iters=30):
    """Chained harness with a loop-VARIANT body: ``carrier`` (an input
    array of ``fn``) rides the fori_loop carry and is perturbed by a
    data-dependent zero each step, so XLA cannot hoist the measured
    computation out of the loop (ADVICE r03: the previous loop-invariant
    body was hoistable; out*0.0 preserved a data dependency but not
    loop-variance)."""
    @jax.jit
    def chain(n, car):
        def body(i, carry):
            acc, car = carry
            out = jnp.sum(jax.tree.leaves(fn(car))[0].astype(jnp.float32))
            return (acc + out * 0.0 + 1.0,
                    car + (out * 0.0).astype(car.dtype))
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), carrier))[0]

    sync(chain(1, carrier))
    t0 = time.perf_counter()
    sync(chain(0, carrier))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, carrier))
    dt = max(time.perf_counter() - t0 - ov, 1e-9) / iters
    print(json.dumps({"part": name,
                      "ms_per_64": round(dt * 1e3 * 64 / BATCH, 3)}),
          flush=True)


def jacobi_unrolled(boxes, scores, valid, threshold, unroll):
    """nms() with the while_loop replaced by a fixed unroll (INEXACT when
    the suppression chain exceeds ``unroll`` — probe only)."""
    k = boxes.shape[0]
    neg = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(valid, scores, neg))[::-1]
    sboxes = boxes[order]
    svalid = valid[order]
    overlap = iou_matrix(sboxes)
    idx = jnp.arange(k)
    dom = (overlap > threshold) & (idx[:, None] < idx[None, :]) \
        & svalid[:, None]
    keep = svalid
    for _ in range(unroll):
        keep = svalid & ~jnp.any(dom & keep[:, None], axis=0)
    return jnp.zeros(k, bool).at[order].set(keep)


def hybrid(boxes, scores, valid, threshold, unroll):
    """Unroll U Jacobi steps inline, then a convergence-checked
    while_loop for the (rare) longer chains — exact, but the loop body
    usually runs once (the check)."""
    k = boxes.shape[0]
    neg = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(valid, scores, neg))[::-1]
    sboxes = boxes[order]
    svalid = valid[order]
    overlap = iou_matrix(sboxes)
    idx = jnp.arange(k)
    dom = (overlap > threshold) & (idx[:, None] < idx[None, :]) \
        & svalid[:, None]

    def once(keep):
        return svalid & ~jnp.any(dom & keep[:, None], axis=0)

    keep = svalid
    for _ in range(unroll):
        keep = once(keep)

    def step(state):
        kp, _ = state
        new = once(kp)
        return new, jnp.any(new != kp)

    keep, _ = jax.lax.while_loop(
        lambda s: s[1], step, (once(keep), jnp.any(once(keep) != keep)))
    return jnp.zeros(k, bool).at[order].set(keep)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    kb = jax.random.PRNGKey
    # Stage-1 merged candidate statistics: random boxes over the image.
    xy1 = jax.random.uniform(kb(0), (BATCH, NC, 2), jnp.float32, 0, 120)
    wh = jax.random.uniform(kb(1), (BATCH, NC, 2), jnp.float32, 12, 60)
    boxes = jnp.concatenate([xy1, xy1 + wh], -1)
    scores = jax.random.uniform(kb(2), (BATCH, NC))
    valid = jnp.ones((BATCH, NC), bool)

    def vm(f, *extra):
        return jax.vmap(lambda b, s, v: f(b, s, v, 0.7, *extra))(
            boxes, scores, valid)

    def vms(f, *extra):
        return lambda s: jax.vmap(lambda b, sc, v: f(b, sc, v, 0.7, *extra))(
            boxes, s, valid)

    timed("nms_while (current)", vms(nms), scores)
    timed("nms_argsort_gather", lambda s: jax.vmap(
        lambda b, sc, v: b[jnp.argsort(jnp.where(v, sc, -1e30))[::-1]]
    )(boxes, s, valid), scores)
    timed("nms_iou_only", lambda b: jax.vmap(iou_matrix)(b), boxes)
    for u in (4, 8, 16):
        timed(f"nms_unroll{u} (inexact probe)",
              vms(jacobi_unrolled, u), scores)
    for u in (4, 8):
        timed(f"nms_hybrid{u}", vms(hybrid, u), scores)

    # Exactness + convergence statistics of the unrolled probe.
    ref = vm(nms)
    for u in (4, 8, 16):
        got = vm(jacobi_unrolled, u)
        print(json.dumps({"unroll": u,
                          "mismatch_frac": float(jnp.mean(got != ref))}),
              flush=True)
    got = vm(hybrid, 4)
    print(json.dumps({"hybrid4_exact": bool(jnp.all(got == ref))}),
          flush=True)

    # --- stage-2 crops ------------------------------------------------
    img = jax.random.uniform(kb(3), (BATCH, 160, 160, 3),
                             jnp.float32, 0, 255)
    # Integer boxes per the pipeline's convention (cascade rounds every
    # stage's boxes; ADVICE r03 item 3 — keeps the weight matrices'
    # sparsity pattern production-identical).
    cb = jnp.round(
        jnp.concatenate([xy1[:, :32], xy1[:, :32] + wh[:, :32]], -1))

    def crop(dt):
        return lambda im: jax.vmap(lambda i, b: crop_and_resize(
            i, b, (24, 24), compute_dtype=dt))(im, cb)

    timed("crop24_bf16 (current)", crop(jnp.bfloat16), img)
    timed("crop24_f32", crop(jnp.float32), img)

    def crop_weights_only(i, b):
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        sx = (x2 - x1 + 1.0) / 24
        sy = (y2 - y1 + 1.0) / 24
        src_y = ((jnp.arange(24.0)[None] + 0.5) * sy[:, None]
                 - 0.5 + y1[:, None])
        src_x = ((jnp.arange(24.0)[None] + 0.5) * sx[:, None]
                 - 0.5 + x1[:, None])
        wy = jnp.maximum(0., 1. - jnp.abs(src_y[..., None]
                                          - jnp.arange(160.0)))
        wx = jnp.maximum(0., 1. - jnp.abs(src_x[..., None]
                                          - jnp.arange(160.0)))
        return jnp.sum(wy.astype(jnp.bfloat16).astype(jnp.float32)) + \
            jnp.sum(wx.astype(jnp.bfloat16).astype(jnp.float32))

    timed("crop24_weights_only",
          lambda im: jax.vmap(crop_weights_only)(im, cb), img)

    def crop_first_einsum(i, b):
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        sy = (y2 - y1 + 1.0) / 24
        src_y = ((jnp.arange(24.0)[None] + 0.5) * sy[:, None]
                 - 0.5 + y1[:, None])
        wy = jnp.maximum(0., 1. - jnp.abs(src_y[..., None]
                                          - jnp.arange(160.0)))
        rows = jnp.einsum("koh,hwc->kowc", wy.astype(jnp.bfloat16),
                          i.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return rows

    timed("crop24_first_einsum",
          lambda im: jax.vmap(crop_first_einsum)(im, cb), img)

    # 48^2 stage-3 shape (budget 8)
    cb3 = jnp.round(
        jnp.concatenate([xy1[:, :8], xy1[:, :8] + wh[:, :8]], -1))
    timed("crop48_bf16 (current)", lambda im: jax.vmap(
        lambda i, b: crop_and_resize(i, b, (48, 48),
                                     compute_dtype=jnp.bfloat16))(im, cb3),
          img)


if __name__ == "__main__":
    main()
