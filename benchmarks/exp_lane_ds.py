"""Probe: does Mosaic lower a 128-aligned dynamic slice on the LANE dim?

If yes, the warp kernel can X-band: per output tile, contract only the
~2 128-lane slices its X taps span (prefetched slice offset), halving
the fold/wx/z work that dominates the ~2.1 ms/64 warp
(BENCHMARKS.md: band 32 vs 128 measured equal -> H-dot is NOT the
bottleneck; the per-slice fold pipeline is).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(off_ref, x_ref, o_ref):
    i = pl.program_id(0)
    off = pl.multiple_of(off_ref[i], 128)
    o_ref[0] = x_ref[0, :, pl.ds(off, 256)]


def main():
    n, h, wl = 4, 8, 512
    x = jnp.arange(n * h * wl, dtype=jnp.float32).reshape(n, h, wl)
    offs = jnp.asarray([0, 128, 256, 128], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, h, wl), lambda i, offs: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, h, 256), lambda i, offs: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, 256), jnp.float32),
    )(offs, x)
    want = np.stack([np.asarray(x)[k, :, o:o + 256]
                     for k, o in enumerate(np.asarray(offs))])
    np.testing.assert_array_equal(np.asarray(out), want)
    print("lane-dim 128-aligned dynamic slice: SUPPORTED, exact")


if __name__ == "__main__":
    main()
