"""packed_conv vs XLA's conv emitter at the cascade tower shapes.

Shapes are the dominant convs of the pipeline bench (64 images at 160²,
worst-case budgets): P-Net pyramid level 0, R-Net conv1/conv2 on the
8192-crop batch, O-Net conv1/conv2/conv3 on the 4096-crop batch.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from alink_tpu.ops.packconv import conv_flops, packed_conv

SHAPES = [
    # (name, input shape, ksize, cout)
    ("pnet1_L0", (64, 96, 96, 3), 3, 10),
    ("pnet2_L0", (64, 47, 47, 10), 3, 16),
    ("pnet3_L0", (64, 45, 45, 16), 3, 32),
    ("rnet1", (8192, 24, 24, 3), 3, 28),
    ("rnet2", (8192, 11, 11, 28), 3, 48),
    ("onet1", (4096, 48, 48, 3), 3, 32),
    ("onet2", (4096, 23, 23, 32), 3, 64),
    ("onet3", (4096, 10, 10, 64), 3, 64),
]


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(fn, x, k, iters=30):
    @jax.jit
    def chain(n, x, k):
        def body(i, acc):
            out = fn(x + (0.0 * acc).astype(x.dtype), k)
            return acc + jnp.mean(out)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, x, k))
    t0 = time.perf_counter()
    sync(chain(0, x, k))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, x, k))
    return (time.perf_counter() - t0 - ovh) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def plain(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    for p in (4, 8):
        packed = partial(packed_conv, p=p)
        for name, shape, ks, cout in SHAPES:
            x = jax.random.normal(jax.random.PRNGKey(0), shape,
                                  jnp.bfloat16)
            k = jax.random.normal(jax.random.PRNGKey(1),
                                  (ks, ks, shape[-1], cout),
                                  jnp.bfloat16) * 0.2
            fl = conv_flops(shape, (ks, ks, shape[-1], cout))
            tp = timed(plain, x, k) if p == 4 else None
            tk = timed(packed, x, k)
            print(json.dumps({
                "shape": name, "p": p,
                "plain_ms": None if tp is None else round(tp * 1e3, 3),
                "packed_ms": round(tk * 1e3, 3),
                "plain_tfs": None if tp is None else round(fl / tp / 1e12, 1),
                "packed_tfs": round(fl / tk / 1e12, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
