"""Probe: int8 vs bf16 conv throughput on this chip.

v5e's int8 systolic peak is 2x bf16; if XLA lowers int8 convs natively,
a post-training-quantized ArcFace forward is the lever for the 10k
faces/sec north star (BENCHMARKS.md "known headroom").
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def bench(dtype, out_dtype, n=64, hw=28, c=256):
    x = (jax.random.uniform(jax.random.PRNGKey(0), (n, hw, hw, c)) * 3)
    w = (jax.random.uniform(jax.random.PRNGKey(1), (3, 3, c, c)) * 3)
    x = x.astype(dtype)
    w = w.astype(dtype)

    @jax.jit
    def many(x, w, steps):
        def body(i, acc):
            y = conv(x, w, out_dtype)
            return acc + y.astype(jnp.float32).mean()
        return lax.fori_loop(0, steps, body, jnp.float32(0.0))

    sync(many(x, w, 2))
    steps = 30
    t0 = time.perf_counter()
    sync(many(x, w, steps))
    dt = (time.perf_counter() - t0) / steps
    flops = 2 * n * hw * hw * c * c * 9
    return dt, flops / dt / 1e12


def main():
    out = {}
    for name, dtype, od in (
        ("bf16", jnp.bfloat16, jnp.float32),
        ("int8", jnp.int8, jnp.int32),
    ):
        try:
            dt, tflops = bench(dtype, od)
            out[name] = {"ms": round(dt * 1e3, 2), "tops": round(tflops, 1)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:120]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
