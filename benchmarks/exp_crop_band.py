"""Physics probe: is the dense-scene per-crop x-fold K-bound or
per-dot-overhead-bound?  (VERDICT r4 #5, the "2-tap sparsity" lever.)

Round-4 isolated the stage-2 crop at dense budgets to ~3.6 ms/64 of
which ~3.4 ms is the x-fold: 16,384 tiny (24,160)@(160,72) batched
dots, and showed contraction ORDER doesn't matter.  Two hypotheses
remain for what the 3.4 ms is made of:

- K-bound: each dot streams K=160 source columns; a banded fold that
  only contracts the ~tap-span columns (small crowd boxes span 20-40
  source cols) would cut it ~3-4x.  This is the warp-banding playbook,
  and would justify building a production banded path (exact
  full-width fallback for large boxes).
- overhead-bound: the fixed per-dot issue cost dominates; banding K
  changes nothing, and NO reformulation that keeps 16K separate dots
  can reach <1.5 ms — a conclusive negative for the crop-kernel lever
  (the crowd profile stays the answer for dense scenes).

Variants (same numerics on small boxes, chained-harness ms/64):
  full      shipped crop_and_resize (y-pass + full-W x-fold)
  band64    shared y-pass, then per-crop dynamic 64-col W-band slice
            (8-aligned) + banded x-fold (K=64)
  band32    same with K=32 (boxes <=30 px)
The band variants pay a (K,oh,band,C) gather to build the banded rows —
its cost is reported separately (gather_only) so the dot saving can be
attributed.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu.ops.image import _crop_weights

N_IMG = 64 if jax.default_backend() == "tpu" else 2
K_PER = 256          # stage-2 dense budget per image
H = W = 160
OH = OW = 24


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, img, boxes, iters=20):
    @jax.jit
    def chain(v, b, n):
        def body(i, carry):
            vv, acc = carry
            out = jnp.mean(fn(vv, b).astype(jnp.float32))
            return vv + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (v, jnp.float32(0.0)))[1]

    sync(chain(img, boxes, 1))
    t0 = time.perf_counter()
    sync(chain(img, boxes, 0))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(img, boxes, iters))
    dt = (time.perf_counter() - t0 - ovh) / iters
    print(json.dumps({"case": name,
                      "ms_per_64": round(dt * 1000 * 64 / N_IMG, 3)}),
          flush=True)


def full_crop(imgs, boxes):
    """Shipped formulation: per-image y-pass + full-width x-fold."""
    def one(img, bx):
        wy, wx = _crop_weights(bx, (OH, OW), H, W)
        cdt = jnp.bfloat16
        rows = jnp.einsum("koh,hwc->kowc", wy.astype(cdt), img.astype(cdt),
                          preferred_element_type=jnp.float32)
        return jnp.einsum("kpw,kowc->kopc", wx.astype(cdt),
                          rows.astype(cdt),
                          preferred_element_type=jnp.float32)
    return jax.vmap(one)(imgs, boxes)


def banded_crop(imgs, boxes, band):
    """Shared y-pass, then banded x-fold at K=band source cols."""
    def one(img, bx):
        wy, wx = _crop_weights(bx, (OH, OW), H, W)
        cdt = jnp.bfloat16
        rows = jnp.einsum("koh,hwc->kowc", wy.astype(cdt), img.astype(cdt),
                          preferred_element_type=jnp.float32)  # (K,oh,W,C)
        # 8-aligned per-crop W-band start (taps of box [x1,x2] live in
        # floor(x1)-1 .. ceil(x2)+1; clamp so the band fits).
        wlo = jnp.clip((bx[:, 0] - 1.0) // 8 * 8, 0, W - band
                       ).astype(jnp.int32)                       # (K,)
        rows_b = jax.vmap(
            lambda r, o: jax.lax.dynamic_slice_in_dim(r, o, band, axis=1)
        )(rows.astype(cdt), wlo)                          # (K,oh,band,C)
        # Banded weights: shift each crop's tap grid by its band start.
        widx = jnp.arange(band, dtype=jnp.float32)
        x1, x2 = bx[:, 0], bx[:, 2]
        sx = (x2 - x1 + 1.0) / OW
        src_x = ((jnp.arange(OW, dtype=jnp.float32)[None] + 0.5)
                 * sx[:, None] - 0.5 + x1[:, None])
        src_x = jnp.clip(src_x, x1[:, None], x2[:, None])
        src_b = src_x - wlo[:, None].astype(jnp.float32)
        wx_b = jnp.maximum(0.0, 1.0 - jnp.abs(src_b[:, :, None] - widx))
        return jnp.einsum("kpw,kowc->kopc", wx_b.astype(cdt), rows_b,
                          preferred_element_type=jnp.float32)
    return jax.vmap(one)(imgs, boxes)


def gather_only(imgs, boxes, band):
    """Just the y-pass + band gather (no x-fold): prices the slice."""
    def one(img, bx):
        wy, _ = _crop_weights(bx, (OH, OW), H, W)
        cdt = jnp.bfloat16
        rows = jnp.einsum("koh,hwc->kowc", wy.astype(cdt), img.astype(cdt),
                          preferred_element_type=jnp.float32)
        wlo = jnp.clip((bx[:, 0] - 1.0) // 8 * 8, 0, W - band
                       ).astype(jnp.int32)
        rows_b = jax.vmap(
            lambda r, o: jax.lax.dynamic_slice_in_dim(r, o, band, axis=1)
        )(rows.astype(cdt), wlo)
        return rows_b.astype(jnp.float32)
    return jax.vmap(one)(imgs, boxes)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (N_IMG, H, W, 3))
                       .astype(np.float32))
    # Small crowd-scene squares, 20-28 px (taps fit both bands).
    side = rng.uniform(20, 28, (N_IMG, K_PER))
    x1 = rng.uniform(0, W - 30, (N_IMG, K_PER))
    y1 = rng.uniform(0, H - 30, (N_IMG, K_PER))
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + side - 1, y1 + side - 1], -1).astype(np.float32))

    # Parity check first (band64 must equal full on these boxes).
    a = full_crop(imgs[:2], boxes[:2])
    b = banded_crop(imgs[:2], boxes[:2], 64)
    err = float(jnp.max(jnp.abs(a - b)))
    print(json.dumps({"parity_max_err": round(err, 4)}), flush=True)

    for rep in range(2):
        timed(f"full_rep{rep}", full_crop, imgs, boxes)
        timed(f"band64_rep{rep}",
              lambda v, b: banded_crop(v, b, 64), imgs, boxes)
        timed(f"band32_rep{rep}",
              lambda v, b: banded_crop(v, b, 32), imgs, boxes)
    timed("gather_only64", lambda v, b: gather_only(v, b, 64), imgs, boxes)


if __name__ == "__main__":
    main()
