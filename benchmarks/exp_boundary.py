"""Attribute the align->embed fusion overhead (VERDICT r3 item 1a).

exp_pipeline_prefix (r50) measured embed-in-pipeline at 6.06 ms/64 vs
embed_alone 4.47 — the warp's padded (n, 12544, 8) f32 output must be
sliced to 3 lanes, reshaped to NHWC and cast to bf16 before the stem
conv.  This times each candidate cost in isolation:

  embed_f32      — embed from a clean (n,112,112,3) f32 tensor (baseline)
  embed_bf16     — embed from bf16 input (cast cost check)
  relayout_only  — the slice/reshape/cast of a (n,12544,8) f32 tensor
  embed_padded   — embed from the sliced/reshaped padded layout
  warp_embed     — the real align(warp)->embed chain
  warp_only      — the warp alone (for the sum check)
"""

import time

import jax
import jax.numpy as jnp

from alink_tpu.models import ArcFaceResNet50
from alink_tpu.ops.image import affine_warp_batch_pallas

BATCH = 256


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, *args, iters=30):
    @jax.jit
    def chain(a, n):
        def body(i, carry):
            x0, acc = carry
            out = jnp.mean(fn(x0, *a[1:]).astype(jnp.float32))
            return x0 + (0.0 * acc).astype(x0.dtype), acc + out
        return jax.lax.fori_loop(0, n, body, (a[0], jnp.float32(0.0)))[1]

    sync(chain(args, 1))
    t0 = time.perf_counter()
    sync(chain(args, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(args, iters))
    dt = (time.perf_counter() - t0 - ov) / iters
    print(f"{name:16s} {dt * 1e3 * 64.0 / BATCH:6.3f} ms/64", flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    embedder = ArcFaceResNet50()
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    k = jax.random.PRNGKey(1)
    chips = jax.random.uniform(k, (BATCH, 112, 112, 3), jnp.float32, 0, 255)
    padded = jax.random.uniform(k, (BATCH, 12544, 8), jnp.float32, 0, 255)
    imgs = jax.random.uniform(k, (BATCH, 160, 160, 3), jnp.float32, 0, 255)
    th = jax.random.uniform(jax.random.PRNGKey(2), (BATCH,), minval=-0.2,
                            maxval=0.2)
    s = jax.random.uniform(jax.random.PRNGKey(3), (BATCH,), minval=0.8,
                           maxval=2.0)
    c, si = jnp.cos(th) * s, jnp.sin(th) * s
    t = jnp.full((BATCH, 2), 20.0)
    Ms = jnp.stack([jnp.stack([c, -si, t[:, 0]], -1),
                    jnp.stack([si, c, t[:, 1]], -1)], 1)

    def relayout(p):
        return p[:, : 112 * 112, :3].reshape(BATCH, 112, 112, 3).astype(
            jnp.bfloat16)

    timed("embed_f32", lambda x: embedder.apply(eparams, x), chips)
    timed("embed_bf16", lambda x: embedder.apply(eparams, x),
          chips.astype(jnp.bfloat16))
    timed("relayout_only", relayout, padded)
    timed("embed_padded", lambda p: embedder.apply(eparams, relayout(p)),
          padded)
    timed("warp_only",
          lambda im, M: affine_warp_batch_pallas(im, M, (112, 112)),
          imgs, Ms)
    timed("warp_embed",
          lambda im, M: embedder.apply(
              eparams, affine_warp_batch_pallas(im, M, (112, 112))),
          imgs, Ms)

    # Probe the interaction: a barrier between warp and embed blocks
    # cross-op fusion/layout propagation; the "indep" variant runs both
    # in one program WITHOUT a data dependency (co-residency only).
    def warp_barrier_embed(im, M):
        chips_ = affine_warp_batch_pallas(im, M, (112, 112))
        chips_ = jax.lax.optimization_barrier(chips_)
        return embedder.apply(eparams, chips_)

    timed("warp_BAR_embed", warp_barrier_embed, imgs, Ms)

    def warp_and_indep_embed(im, M):
        w = affine_warp_batch_pallas(im, M, (112, 112))
        e = embedder.apply(eparams, chips)  # independent input
        return jnp.mean(w.astype(jnp.float32)) + jnp.mean(e)

    timed("warp_INDEP_embed", warp_and_indep_embed, imgs, Ms)


if __name__ == "__main__":
    main()
