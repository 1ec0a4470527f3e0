"""Probe: narrow-lane pallas output stores vs 128-lane packed stores.

The warp kernel emits (n, P, cpad=8) f32.  TPU HBM arrays are tiled
T(8, 128) on the two minor dims, so an 8-lane minor dim is padded to
128 lanes — the store writes ~16x the logical bytes and every consumer
re-reads the same padding (the failing exp_warp_r3b HLO shows
``f32[64,12544,8]{2,1,0:T(8,128)}``).  This measures the asymmetry and
probes which in-kernel repack ops Mosaic can lower:

  store8        — write (tp, 8) blocks to an (n, P, 8) array
  store128      — write (tp/16, 128) blocks to an (n, P/16, 128) array
  store8_bf16   — bf16 variant of store8 (halves padded bytes)
  reshape probe — acc (tp, 8) -> (tp/16, 128) inside the kernel
  transp probe  — (128, 128) transpose inside the kernel
  strided probe — acc[j::16, :] sublane-strided read inside the kernel
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N, TP, TILES = 64, 1792, 7
P = TP * TILES  # 12544 = 112*112


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=50):
    f = jax.jit(lambda a, n: jax.lax.fori_loop(
        0, n, lambda i, c: (c[0] + (0.0 * c[1]).astype(c[0].dtype),
                            c[1] + jnp.mean(fn(c[0]).astype(jnp.float32))),
        (a, jnp.float32(0.0)))[1])
    sync(f(x, 1))
    t0 = time.perf_counter()
    sync(f(x, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(f(x, iters))
    dt = (time.perf_counter() - t0 - ov) / iters
    print(f"{name:14s} {dt * 1e3:7.3f} ms/{N}", flush=True)


def k_store8(x_ref, o_ref, *, dt):
    o_ref[0] = (x_ref[0, :, :8] * 2.0).astype(dt)


def k_store128(x_ref, o_ref, *, dt):
    o_ref[0] = (x_ref[0, :TP // 16] * 2.0).astype(dt)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    x = jax.random.uniform(jax.random.PRNGKey(0), (N, TP, 128), jnp.float32)

    def run_store8(dt):
        return pl.pallas_call(
            partial(k_store8, dt=dt),
            grid=(N, TILES),
            in_specs=[pl.BlockSpec((1, TP, 128), lambda i, t: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, TP, 8), lambda i, t: (i, t, 0)),
            out_shape=jax.ShapeDtypeStruct((N, P, 8), dt),
        )

    def run_store128(dt):
        return pl.pallas_call(
            partial(k_store128, dt=dt),
            grid=(N, TILES),
            in_specs=[pl.BlockSpec((1, TP, 128), lambda i, t: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, TP // 16, 128), lambda i, t: (i, t, 0)),
            out_shape=jax.ShapeDtypeStruct((N, P // 16, 128), dt),
        )

    timed("store8_f32", run_store8(jnp.float32), x)
    timed("store128_f32", run_store128(jnp.float32), x)
    timed("store8_bf16", run_store8(jnp.bfloat16), x)
    timed("store128_bf16", run_store128(jnp.bfloat16), x)

    # --- Mosaic lowering probes (correctness, tiny shapes) ---------------
    def k_reshape(x_ref, o_ref):
        acc = x_ref[0, :, :8]                      # (tp, 8)
        o_ref[0] = acc.reshape(TP // 16, 128)

    try:
        out = pl.pallas_call(
            k_reshape,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, TP, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, TP // 16, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, TP // 16, 128), jnp.float32),
        )(x[:1])
        want = np.asarray(x[0, :, :8]).reshape(TP // 16, 128)
        np.testing.assert_array_equal(np.asarray(out[0]), want)
        print("reshape (tp,8)->(tp/16,128): SUPPORTED, exact", flush=True)
    except Exception as e:
        print(f"reshape (tp,8)->(tp/16,128): FAILED: {str(e)[:200]}",
              flush=True)

    def k_transp(x_ref, o_ref):
        o_ref[0] = x_ref[0, :128, :128].T

    try:
        out = pl.pallas_call(
            k_transp,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, TP, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128, 128), jnp.float32),
        )(x[:1])
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      np.asarray(x[0, :128, :128]).T)
        print("transpose (128,128): SUPPORTED, exact", flush=True)
    except Exception as e:
        print(f"transpose (128,128): FAILED: {str(e)[:200]}", flush=True)

    def k_strided(x_ref, o_ref):
        acc = x_ref[0, :, :8]
        o_ref[0] = jax.lax.slice(acc, (3, 0), (TP, 8), (16, 1))

    try:
        out = pl.pallas_call(
            k_strided,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, TP, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, TP // 16, 8), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, TP // 16, 8), jnp.float32),
        )(x[:1])
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      np.asarray(x[0, 3::16, :8]))
        print("strided sublane slice [j::16]: SUPPORTED, exact", flush=True)
    except Exception as e:
        print(f"strided sublane slice [j::16]: FAILED: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
