"""A/B: warp x-windowing (xblocks 1 vs 2) on realistic alignment
transforms.

The in-pipeline attribution measured the x-windowed warp within noise
of the round-3 kernel (1.23 vs 1.22 ms/64).  This probe isolates the
kernel (image-threaded chained harness) across the alignment scale
range — small faces (inverse scale 0.4: taps span ~50 lanes, the
window's best case) through frame-filling faces (1.43: ~250 lanes,
near the window limit) — so the wash can be attributed: per-step
overhead vs window-overflow fallbacks.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu.ops.image import affine_warp_batch_pallas

N = 64 if jax.default_backend() == "tpu" else 2


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, img, Ms, iters=30):
    @jax.jit
    def chain(v, m, n):
        def body(i, carry):
            vv, acc = carry
            out = jnp.mean(fn(vv, m).astype(jnp.float32))
            return vv + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (v, jnp.float32(0.0)))[1]

    sync(chain(img, Ms, 1))
    t0 = time.perf_counter()
    sync(chain(img, Ms, 0))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(img, Ms, iters))
    dt = (time.perf_counter() - t0 - ovh) / iters
    print(json.dumps({"case": name,
                      "ms_per_64": round(dt * 1000 * 64 / N, 3)}),
          flush=True)


def mk_transforms(inv_scales, rng):
    Ms = []
    for i in range(N):
        s = inv_scales[i % len(inv_scales)]
        th = rng.uniform(-0.15, 0.15)
        A = s * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
        t = rng.uniform(0, 30, 2)
        Ms.append(np.hstack([A, t[:, None]]))
    return jnp.asarray(np.stack(Ms), jnp.float32)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (N, 160, 160, 3)
                                  ).astype(np.float32))
    # Round 5: the round-4 wash was xb=2 with the hardcoded
    # xwin = slices-1 (skip 1 of 4).  Narrow column blocks let a
    # 2-slice window fit the tap span (bw=16: <=25 src cols = 75
    # lanes <= the 129-lane window coverage), skipping HALF the
    # H-dots and weight builds.  Interleave all configs per scale
    # case to cancel tunnel drift.
    configs = ((1, 0), (2, 0), (7, 2), (4, 2))
    for label, scales in (("small_faces", [0.4, 0.5, 0.6]),
                          ("mixed", [0.4, 0.8, 1.2, 1.4]),
                          ("large_faces", [1.3, 1.38, 1.43])):
        Ms = mk_transforms(scales, rng)
        for rep in range(2):
            for xb, xw in configs:
                timed(f"{label}_xb{xb}_xw{xw}_rep{rep}",
                      lambda v, m, xb=xb, xw=xw: affine_warp_batch_pallas(
                          v, m, (112, 112), xblocks=xb, xwin=xw), img, Ms)


if __name__ == "__main__":
    main()
