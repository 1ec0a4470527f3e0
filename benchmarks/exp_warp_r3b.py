"""Round-3 warp attribution experiments.

1. The transform statistics the pipeline bench actually produces
   (umeyama of random-init O-Net landmarks -> template): decides
   whether an X-banded kernel's fast path would even be exercised by
   the benchmark, and what window the real workload (mostly upright
   faces) needs.
2. rows_per_tile sweep of the shipped kernel at fixed band: if time
   scales with step count the kernel is per-step-overhead-bound (fatter
   steps win); if it scales with px*lanes it is VPU-weight-bound
   (X-banding wins).
3. n=64 vs n=256 (the trace showed 2.26 -> 3.07 ms/64 going to batch
   256 — reproduce standalone).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu.ops.image import (_band_offsets, _banded_warp_call, _cast_like,
                                 _inv2x2)


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def bench_transforms(n=256):
    """Ms distribution from the bench pipeline's detect stage."""
    from alink_tpu.detect import CascadeConfig, init_cascade_params
    from alink_tpu.detect.cascade import detect_faces
    from alink_tpu.ops.umeyama import arcface_template, umeyama

    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 160, 160, 3),
                           jnp.float32, 0.0, 255.0)
    det = detect_faces(cparams, x, cfg)
    neg = jnp.finfo(det.scores.dtype).min
    best = jnp.argmax(jnp.where(det.valid, det.scores, neg), axis=1)
    lmk = jax.vmap(lambda l, b: l[b])(det.landmarks, best)
    template = arcface_template((112, 112))
    Ms = jax.vmap(lambda l: umeyama(l, template))(lmk)
    Ainv = _inv2x2(Ms[:, :, :2].astype(jnp.float32))
    a = np.asarray(Ainv)
    print("bench transform stats (Ainv):")
    for name, v in [("a00", a[:, 0, 0]), ("a01", a[:, 0, 1]),
                    ("a10", a[:, 1, 0]), ("a11", a[:, 1, 1])]:
        print(f"  {name}: mean {v.mean():+.3f}  p50 {np.median(np.abs(v)):.3f}"
              f"  p90 {np.quantile(np.abs(v), .9):.3f}  max {np.abs(v).max():.3f}")
    span_x = 16 * np.abs(a[:, 0, 0]) + 112 * np.abs(a[:, 0, 1]) + 2
    print(f"  X span for (112r,16c) tiles: p50 {np.median(span_x):.1f} "
          f"p90 {np.quantile(span_x, .9):.1f} max {span_x.max():.1f} cols")
    return Ms


def _make_alignment_ms(n, key, rot_deg=8.0, scale_lo=0.5, scale_hi=1.4):
    """Synthetic upright-ish alignment transforms (the real workload)."""
    k1, k2, k3 = jax.random.split(key, 3)
    th = jax.random.uniform(k1, (n,), minval=-rot_deg, maxval=rot_deg)
    th = th * (np.pi / 180.0)
    s = jax.random.uniform(k2, (n,), minval=scale_lo, maxval=scale_hi)
    t = jax.random.uniform(k3, (n, 2), minval=10.0, maxval=30.0)
    c, si = jnp.cos(th) * s, jnp.sin(th) * s
    Ms = jnp.stack([jnp.stack([c, -si, t[:, 0]], -1),
                    jnp.stack([si, c, t[:, 1]], -1)], 1)
    return Ms


def warp_variant(imgs, Ms, rows_per_tile, band=128):
    n, h, w, c = imgs.shape
    out_size = (112, 112)
    wcn = -(-(w * c) // 128) * 128
    Ainv = _inv2x2(Ms[:, :, :2].astype(jnp.float32))
    bvec = Ms[:, :, 2].astype(jnp.float32)
    scal = jnp.concatenate([Ainv.reshape(n, 4), bvec], axis=1)
    imgsn = imgs.astype(jnp.float32).reshape(n, h, w * c)
    if wcn > w * c:
        imgsn = jnp.pad(imgsn, ((0, 0), (0, 0), (0, wcn - w * c)))
    ylo = _band_offsets(Ainv, bvec, out_size, rows_per_tile, band, h, "zero")
    out = _banded_warp_call(imgsn, scal, ylo, out_size=out_size, band=band,
                            rows_per_tile=rows_per_tile, h=h, w=w, c=c,
                            cpad=8, border="zero", interpret=False)
    return _cast_like(out[:, :112 * 112, :3].reshape(n, 112, 112, 3),
                      imgs.dtype)


def timed(fn, imgs, Ms, iters=30):
    f = jax.jit(lambda im, n: jax.lax.fori_loop(
        0, n, lambda i, carry: (carry[0],
                                carry[1] + jnp.mean(fn(carry[0] + carry[1] * 0,
                                                       Ms))),
        (im, jnp.float32(0.0)))[1])
    sync(f(imgs, 1))
    t0 = time.perf_counter()
    sync(f(imgs, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(f(imgs, iters))
    return (time.perf_counter() - t0 - ov) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    bench_transforms()

    for n in (64, 256):
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (n, 160, 160, 3),
                                  jnp.float32, 0.0, 255.0)
        Ms = _make_alignment_ms(n, jax.random.PRNGKey(5))
        per64 = 64.0 / n
        for rpt in (8, 16, 28):
            dt = timed(partial(warp_variant, rows_per_tile=rpt), imgs, Ms)
            steps = n * (-(-112 // rpt))
            print(f"n={n} rows_per_tile={rpt:3d} band=128: "
                  f"{dt * 1e3 * per64:6.2f} ms/64  ({steps} steps)",
                  flush=True)
        dt = timed(partial(warp_variant, rows_per_tile=16, band=160),
                   imgs, Ms)
        print(f"n={n} rows_per_tile= 16 band=160(full): "
              f"{dt * 1e3 * per64:6.2f} ms/64", flush=True)


if __name__ == "__main__":
    main()
