"""Mosaic capability probe: dynamic LANE-dim slice at 128 granularity.

The planned warp x-windowing rewrite (see BENCHMARKS.md round-4) wants
each grid step to contract only the 2-3 source 128-lane slices its
output x-block actually taps, chosen by a scalar-prefetched dynamic
lane offset on the VMEM-resident image block:

    img_ref[0, pl.ds(row_off, band), pl.ds(lane_off, 256)]

Rows-dim dynamic slices at 8-alignment are known-good (the shipped
banded kernel).  This probe answers whether the *minor* (lane) dim
supports a dynamic 128-aligned offset — if Mosaic rejects it, the
rewrite needs the overlapping-windows array layout instead.

Prints one JSON line: {"dyn_lane_slice": "ok"|"unsupported", ...}.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(off_ref, x_ref, w_ref, o_ref):
    i = pl.program_id(0)
    lo = pl.multiple_of(off_ref[i], 128)
    blk = x_ref[pl.ds(0, 64), pl.ds(lo, 256)]     # dynamic lane offset
    o_ref[0] = jnp.dot(w_ref[...], blk.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    x = jnp.arange(64 * 512, dtype=jnp.bfloat16).reshape(64, 512) % 119.0
    w = jnp.ones((8, 64), jnp.bfloat16)
    offs = jnp.array([0, 128, 256], jnp.int32)

    fn = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(3,),
            in_specs=[pl.BlockSpec((64, 512), lambda i, off: (0, 0)),
                      pl.BlockSpec((8, 64), lambda i, off: (0, 0))],
            out_specs=pl.BlockSpec((1, 8, 256), lambda i, off: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((3, 8, 256), jnp.float32),
    )
    try:
        t0 = time.time()
        out = np.asarray(fn(offs, x, w))
        want = np.stack([
            np.ones((8, 64), np.float32) @ np.asarray(
                x[:64, o:o + 256], np.float32)
            for o in (0, 128, 256)])
        ok = bool(np.allclose(out, want, rtol=1e-2, atol=1e-1))
        print(json.dumps({"dyn_lane_slice": "ok" if ok else "wrong_values",
                          "max_err": float(np.abs(out - want).max()),
                          "secs": round(time.time() - t0, 1)}))
    except Exception as e:  # noqa: BLE001 — capability probe
        print(json.dumps({"dyn_lane_slice": "unsupported",
                          "error": str(e)[:300]}))


if __name__ == "__main__":
    main()
