"""Bench: Pallas int8 3x3 conv vs XLA bf16 conv at LResNet100 shapes.

Measurement notes (hard-won on the remote-tunnel chip):
- iterate inside one jit, chained by a data dependency XLA cannot fold
  (a select against a sentinel — ``x + 0 * mean`` gets simplified and
  the conv hoisted out of the loop, yielding impossible TF/s);
- estimate per-iteration time from the SLOPE between two iteration
  counts (dispatch+fetch latency through the tunnel is tens of ms with
  several ms of jitter, so subtracting a single n=0 calibration is too
  noisy for sub-ms kernels);
- pass the iteration count as a traced value (a static arg would
  recompile inside the timed region).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from alink_tpu.ops import qconv


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def bench(fn, args, n1, n2):
    @jax.jit
    def many(args, n):
        def body(i, carry):
            a0, acc = carry
            y = fn(a0, *args[1:])
            m = y.astype(jnp.float32).mean()
            a2 = jnp.where(m == jnp.float32(1.2345e30),
                           a0 + jnp.array(1, a0.dtype), a0)
            return a2, acc + m
        return lax.fori_loop(0, n, body, (args[0], jnp.float32(0.0)))[1]

    sync(many(args, 2))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        sync(many(args, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(many(args, n2))
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    on_tpu = jax.default_backend() == "tpu"
    n = 64 if on_tpu else 2
    cases = [(56, 56, 64, 64, 60, 240), (28, 28, 128, 128, 200, 800),
             (14, 14, 256, 256, 400, 1600), (7, 7, 512, 512, 400, 1600),
             (14, 14, 512, 512, 200, 800)]
    out = {}
    for h, w, cin, cout, n1, n2 in cases:
        if not on_tpu:
            n1, n2 = 1, 3
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        xi = jax.random.randint(k1, (n, h, w, cin), -127, 128, jnp.int8)
        wi = jax.random.randint(k2, (3, 3, cin, cout), -20, 21, jnp.int8)
        scale = jnp.full((cout,), 0.01, jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        flops = 2.0 * n * h * w * 9 * cin * cout
        dt8 = bench(
            lambda x, w_, s, b: qconv.conv3x3_s1_int8(
                x, w_, s, b, interpret=not on_tpu),
            (xi, wi, scale, bias), n1, n2)
        dtb = bench(
            lambda x, w_: lax.conv_general_dilated(
                x, w_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            (xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16)), n1, n2)
        out[f"{h}x{w}x{cin}->{cout}"] = {
            "int8_ms": round(dt8 * 1e3, 3),
            "int8_tops": round(flops / dt8 / 1e12, 1),
            "bf16_ms": round(dtb * 1e3, 3),
            "bf16_tflops": round(flops / dtb / 1e12, 1),
            "speedup": round(dtb / dt8, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
