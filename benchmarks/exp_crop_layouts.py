"""Layout variants for ``crop_and_resize`` (the stage-2/3 glue hotspot).

exp_nms_crop_ablate.py attribution (chip, batch 256, K=32, 24x24 crops):
the current two-einsum crop costs 0.541 ms/64 bf16 / 0.428 f32, of which
weights + the FIRST einsum are only 0.04 — the rest is (8,128)-tile
padding on every intermediate/output whose minor dim is C=3 (42x lane
padding; bf16's (16,128) tile additionally pads the 3-channel SUBLANE
dim 5.3x, which is why bf16 measures SLOWER than f32 here).  The pure
HBM floor for the crops is ~0.02 ms/64.

Each variant below reformulates the contraction order/layout so no
tensor XLA must materialise carries a narrow minor dim; all are checked
exact (<=1e-4) against the shipped implementation before timing, and a
crop->preprocess->RNet-tower proxy chain is timed as well because the
layout XLA picks for the crop OUTPUT depends on its consumer.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect.cascade import _RNET
from alink_tpu.models import preprocess
from alink_tpu.ops.image import crop_and_resize

BATCH = 256 if jax.default_backend() == "tpu" else 4
K = 32
OUT = 24
SIZE = 160


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
    return dt


def _grids(boxes, out_h, out_w, h, w):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sx = (x2 - x1 + 1.0) / out_w
    sy = (y2 - y1 + 1.0) / out_h
    src_y = ((jnp.arange(out_h, dtype=jnp.float32)[None, :] + 0.5)
             * sy[:, None] - 0.5 + y1[:, None])
    src_x = ((jnp.arange(out_w, dtype=jnp.float32)[None, :] + 0.5)
             * sx[:, None] - 0.5 + x1[:, None])
    src_y = jnp.clip(src_y, y1[:, None], y2[:, None])
    src_x = jnp.clip(src_x, x1[:, None], x2[:, None])
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        src_y[:, :, None] - jnp.arange(h, dtype=jnp.float32)))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        src_x[:, :, None] - jnp.arange(w, dtype=jnp.float32)))
    return wy, wx  # (K, oh, H), (K, ow, W)


def crop_v1_current(img, boxes, out_size, dt):
    return crop_and_resize(img, boxes, out_size, compute_dtype=dt)


def crop_v2_flat_y_first(img, boxes, out_size, dt):
    """y-contraction as ONE un-batched 2-D matmul on the free (H, W*C)
    image view; x-contraction as a k-batched dot with the WIDE free dim
    (o*c) on the rhs; final transpose only touches logical bytes.

    NOTE (all variants): the bare ``.astype(img.dtype)`` is fine for
    this float-only probe, but a variant promoted into the shipped
    ``crop_and_resize`` must restore ``_cast_like``'s round-and-saturate
    for integer image dtypes (ADVICE r03 item 2)."""
    oh, ow = out_size
    h, w, c = img.shape
    wy, wx = _grids(boxes, oh, ow, h, w)
    k = boxes.shape[0]
    # (K*oh, H) @ (H, W*C) -> (K*oh, W*C); minor dim W*C = 480.
    rows = jnp.dot(wy.reshape(k * oh, h).astype(dt),
                   img.reshape(h, w * c).astype(dt),
                   preferred_element_type=jnp.float32)
    rows = rows.reshape(k, oh, w, c)
    # batch k, contract w: lhs wx (k, ow, w), rhs rows (k, oh, w, c)
    # -> (k, ow, oh, c)
    out = jax.lax.dot_general(
        wx.astype(dt), rows.astype(dt),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).astype(img.dtype)


def crop_v3_chw(img, boxes, out_size, dt):
    """Channel-major working set: img -> (C, H, W) once; both
    contractions then see wide minor dims (w, then o*c flattened)."""
    oh, ow = out_size
    h, w, c = img.shape
    wy, wx = _grids(boxes, oh, ow, h, w)
    k = boxes.shape[0]
    imgc = img.transpose(2, 0, 1).astype(dt)          # (C, H, W)
    # (K*oh, H) @ (H, C*W)? need contract h of (c,h,w): use dot_general
    # lhs wy (k*oh, h), rhs imgc (c, h, w) contracting h -> (k*oh, c, w)
    rows = jax.lax.dot_general(
        wy.reshape(k * oh, h).astype(dt), imgc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    rows = rows.reshape(k, oh, c, w)
    # batch k, contract w: lhs wx (k, ow, w), rhs rows (k, oh*c, w)
    out = jax.lax.dot_general(
        wx.astype(dt), rows.reshape(k, oh * c, w).astype(dt),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (k, ow, oh*c)
    return out.reshape(k, ow, oh, c).transpose(0, 2, 1, 3).astype(img.dtype)


def crop_v4_single_mm(img, boxes, out_size, dt):
    """BOTH contractions as single un-batched matmuls: the x-step puts
    (k, p) together in the OUTPUT lanes (no k-batching anywhere) —
    rowsT = img_chw2d (C*H, W) @ wx_allᵀ (W, K*ow); then the y-step is a
    k-batched dot on a (k, h, c*ow) view."""
    oh, ow = out_size
    h, w, c = img.shape
    wy, wx = _grids(boxes, oh, ow, h, w)
    k = boxes.shape[0]
    imgc = img.transpose(2, 0, 1).reshape(c * h, w).astype(dt)
    # (C*H, W) @ (W, K*ow) -> (C*H, K*ow); minor K*ow = 768.
    rowsT = jnp.dot(imgc, wx.reshape(k * ow, w).T.astype(dt),
                    preferred_element_type=jnp.float32)
    rowsT = rowsT.reshape(c, h, k, ow).transpose(2, 1, 0, 3)  # (k,h,c,ow)
    out = jax.lax.dot_general(
        wy.astype(dt), rowsT.reshape(k, h, c * ow).astype(dt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (k, oh, c*ow)
    return out.reshape(k, oh, c, ow).transpose(0, 1, 3, 2).astype(img.dtype)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    kb = jax.random.PRNGKey
    img = jax.random.uniform(kb(3), (BATCH, SIZE, SIZE, 3),
                             jnp.float32, 0, 255)
    xy1 = jax.random.uniform(kb(0), (BATCH, K, 2), jnp.float32, 0, 120)
    wh = jax.random.uniform(kb(1), (BATCH, K, 2), jnp.float32, 12, 60)
    boxes = jnp.round(jnp.concatenate([xy1, xy1 + wh], -1))

    variants = {
        "v1_current": crop_v1_current,
        "v2_flat_y_first": crop_v2_flat_y_first,
        "v3_chw": crop_v3_chw,
        "v4_single_mm": crop_v4_single_mm,
    }

    # Exactness vs the shipped f32 path.
    ref = jax.vmap(lambda i, b: crop_v1_current(
        i, b, (OUT, OUT), jnp.float32))(img, boxes)
    for name, fn in variants.items():
        got = jax.vmap(lambda i, b: fn(i, b, (OUT, OUT), jnp.float32))(
            img, boxes)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(json.dumps({"variant": name, "max_abs_err_f32": err}),
              flush=True)

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for name, fn in variants.items():
            timed(f"crop24 {name} {dt_name}",
                  lambda im, fn=fn, dt=dt: jax.vmap(
                      lambda i, b: fn(i, b, (OUT, OUT), dt))(im, boxes),
                  img)

    # In-context proxy: crop -> preprocess -> R-Net tower (the layout XLA
    # picks for the crop output depends on this consumer).
    params = _RNET.init(kb(9), jnp.zeros((1, 24, 24, 3)))

    def chainfn(fn, dt):
        def run(i, b):
            crops = fn(i, b, (OUT, OUT), dt)
            prob, reg = _RNET.apply(params, preprocess.mtcnn(crops))
            return prob
        return lambda im: jax.vmap(run)(im, boxes)

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for name, fn in variants.items():
            timed(f"crop24+rnet {name} {dt_name}", chainfn(fn, dt), img)

    # Stage-3 shape: K=8, 48x48.
    boxes3 = boxes[:, :8]
    for name, fn in variants.items():
        timed(f"crop48 {name} bf16", lambda im, fn=fn: jax.vmap(
            lambda i, b: fn(i, b, (48, 48), jnp.bfloat16))(im, boxes3),
              img)


if __name__ == "__main__":
    main()
