"""Probe Mosaic support for the transposed-warp building blocks.

  tdot    — lax.dot_general contracting lhs dim 0 with rhs dim 0:
            (band, 128) x (band, tp) -> (128, tp)   [no explicit transpose]
  ttall   — explicit .T of a non-square (160, 128) slice
  bcast   — (128, 1) op (1, tp) broadcasting to (128, tp)
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BAND, TP, H = 128, 1792, 160


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    a = jax.random.uniform(jax.random.PRNGKey(0), (1, H, 128), jnp.float32)
    b = jax.random.uniform(jax.random.PRNGKey(1), (1, BAND, TP), jnp.float32)

    def k_tdot(a_ref, b_ref, o_ref):
        lhs = a_ref[0, :BAND].astype(jnp.bfloat16)      # (band, 128)
        rhs = b_ref[0].astype(jnp.bfloat16)             # (band, tp)
        o_ref[0] = jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    try:
        out = pl.pallas_call(
            k_tdot,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, H, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, BAND, TP), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, TP), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128, TP), jnp.float32),
        )(a, b)
        want = np.asarray(a[0, :BAND]).astype(np.float32).T.astype(
            jnp.bfloat16).astype(np.float32) @ np.asarray(b[0]).astype(
            jnp.bfloat16).astype(np.float32)
        err = np.abs(np.asarray(out[0]) - want).max() / max(want.max(), 1)
        print(f"tdot lhs-dim0 contraction: SUPPORTED, rel err {err:.2e}",
              flush=True)
    except Exception as e:
        print(f"tdot lhs-dim0 contraction: FAILED: {str(e)[:160]}",
              flush=True)

    def k_ttall(a_ref, o_ref):
        o_ref[0] = a_ref[0].T                           # (160,128)->(128,160)

    try:
        out = pl.pallas_call(
            k_ttall,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, H, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, H), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128, H), jnp.float32),
        )(a)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(a[0]).T)
        print("transpose (160,128): SUPPORTED, exact", flush=True)
    except Exception as e:
        print(f"transpose (160,128): FAILED: {str(e)[:160]}", flush=True)

    def k_bcast(b_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.float32, (128, 1), 0)
        row = b_ref[0, 0:1, :]                          # (1, tp)
        o_ref[0] = jnp.maximum(0.0, 1.0 - jnp.abs(row - col))

    try:
        out = pl.pallas_call(
            k_bcast,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, BAND, TP), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, TP), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128, TP), jnp.float32),
        )(b)
        col = np.arange(128, dtype=np.float32)[:, None]
        want = np.maximum(0.0, 1.0 - np.abs(np.asarray(b[0, 0:1]) - col))
        np.testing.assert_allclose(np.asarray(out[0]), want, rtol=0, atol=0)
        print("(128,1)x(1,tp) broadcast: SUPPORTED, exact", flush=True)
    except Exception as e:
        print(f"(128,1)x(1,tp) broadcast: FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
