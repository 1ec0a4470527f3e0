"""A/B: cascade↔embed CROSS-BATCH software pipelining (VERDICT r4 #4).

The typical-profile pipeline is additive: ~2.7 ms/64 of cascade+align
glue plus the embed matmuls, serially (the round-4 fence results showed
intra-batch scheduling is already optimal — but they never tested
cross-batch overlap).  Hypothesis: in ONE program, embedding batch i-1
(MXU-bound) while cascading batch i (VPU/HBM-bound glue) lets the
scheduler hide one behind the other, approaching max() instead of sum.

Three measurements per embedder, interleaved to cancel tunnel drift:
- ``serial``   — out = embed(cascade(imgs)) per fori_loop step (the
                 shipped FaceModel.pipeline shape).
- ``piped``    — the loop carries the previous step's chips: each step
                 computes embed(prev_chips) AND cascade(imgs) with NO
                 data dependency between them, then passes the new
                 chips forward.  Same per-step work in steady state.
- ``cascade`` / ``embed`` — the two halves alone (the sum/max bounds).

A null result (piped == serial) is the expected TPU answer — one
TensorCore executes one instruction stream, and XLA does not co-schedule
independent fusions — but the fence experiments don't rule out overlap
of async DMA prep against matmuls, so it must be measured, win or
negative (BENCHMARKS.md row either way).
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet34, ArcFaceResNet50

N = 256 if jax.default_backend() == "tpu" else 2
SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, chain, x, iters=20):
    sync(chain(x, 2))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ovh) / iters
    print(json.dumps({"case": name,
                      "ms_per_64": round(dt * 1000 * 64 / N, 3),
                      "faces_per_sec": round(N / dt, 1)}), flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(0)
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (N, SIZE, SIZE, 3),
                           jnp.float32, 0.0, 255.0)

    for name, mk in (("r34", ArcFaceResNet34), ("r50", ArcFaceResNet50)):
        model = mk()
        params = model.init(key, jnp.zeros((1, 112, 112, 3)))
        fm = FaceModel(params, cparams, cfg, embedder=model)

        @jax.jit
        def serial(imgs, n, fm=fm, params=params):
            def body(i, carry):
                im, acc = carry
                out = fm.pipeline(params, cparams, im)
                return im + 0.0 * acc, acc + jnp.mean(out)
            return jax.lax.fori_loop(0, n, body,
                                     (imgs, jnp.float32(0.0)))[1]

        @jax.jit
        def piped(imgs, n, fm=fm, params=params, model=model):
            chips0 = jnp.zeros((N, 112, 112, 3), jnp.float32)

            def body(i, carry):
                im, chips, acc = carry
                emb = model.apply(params, chips)       # batch i-1
                new_chips, _ = fm._best_chips(cparams, im)  # batch i
                return im + 0.0 * acc, new_chips, acc + jnp.mean(emb)
            return jax.lax.fori_loop(0, n, body,
                                     (imgs, chips0, jnp.float32(0.0)))[2]

        @jax.jit
        def cascade_only(imgs, n, fm=fm):
            def body(i, carry):
                im, acc = carry
                chips, _ = fm._best_chips(cparams, im)
                return im + 0.0 * acc, acc + jnp.mean(chips)
            return jax.lax.fori_loop(0, n, body,
                                     (imgs, jnp.float32(0.0)))[1]

        @jax.jit
        def embed_only(chips, n, model=model, params=params):
            def body(i, carry):
                ch, acc = carry
                emb = model.apply(params, ch)
                return ch + 0.0 * acc, acc + jnp.mean(emb)
            return jax.lax.fori_loop(0, n, body,
                                     (chips, jnp.float32(0.0)))[1]

        chips_in = jax.random.uniform(jax.random.PRNGKey(3),
                                      (N, 112, 112, 3), jnp.float32,
                                      0.0, 255.0)
        for rep in range(2):
            timed(f"{name}_serial_rep{rep}", serial, x)
            timed(f"{name}_piped_rep{rep}", piped, x)
        timed(f"{name}_cascade_only", cascade_only, x)
        timed(f"{name}_embed_only",
              lambda c, n, f=embed_only: f(c, n), chips_in)


if __name__ == "__main__":
    main()
