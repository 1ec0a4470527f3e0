"""Crop-grouped tower concept: pack G independent crops into channels.

The cascade towers' cost is NOT the convs (XLA emits those at ~30-50
TF/s) but the bandwidth-bound glue — ceil-pools, PReLU, casts — running
at 28-64 channels, i.e. 22-50% of a 128-lane tile
(benchmarks/bench_tower_glue.py).  Packing G crops channel-wise and
using feature_group_count=G convs (same weights tiled per group) keeps
the math identical while every elementwise/pool op sees G-fold fuller
lanes.

This measures full R-Net / O-Net towers at G in {1, 2, 4} plus the
P-Net pyramid level-0 tower with images grouped.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from alink_tpu.models.mtcnn import _ceil_pool


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def conv_g(x, kernel, bias, groups):
    """Grouped conv with canonical (kh,kw,C,Cout) weights tiled G times."""
    k = jnp.tile(kernel, (1, 1, 1, groups))
    out = lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.bfloat16)
    return out + jnp.tile(bias, groups).astype(out.dtype)


def prelu_g(x, alpha, groups):
    a = jnp.tile(alpha, groups).astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def group(x, g):
    """(N, H, W, C) -> (N/g, H, W, g*C)."""
    n, h, w, c = x.shape
    return x.reshape(n // g, g, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
        n // g, h, w, g * c)


def ungroup(x, g):
    n, h, w, gc = x.shape
    c = gc // g
    return x.reshape(n, h, w, g, c).transpose(0, 3, 1, 2, 4).reshape(
        n * g, h, w, c)


def make_rnet(g):
    key = jax.random.PRNGKey(0)
    ks = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16) * .2
          for i, s in enumerate([(3, 3, 3, 28), (3, 3, 28, 48),
                                 (2, 2, 48, 64)])]
    bs = [jnp.zeros((28,), jnp.bfloat16), jnp.zeros((48,), jnp.bfloat16),
          jnp.zeros((64,), jnp.bfloat16)]
    als = [jnp.full((c,), 0.25, jnp.bfloat16) for c in (28, 48, 64)]
    wf = jax.random.normal(key, (576, 128), jnp.bfloat16) * 0.1

    def tower(x):
        x = ((x - 127.5) * 0.0078125).astype(jnp.bfloat16)
        x = group(x, g) if g > 1 else x
        x = prelu_g(conv_g(x, ks[0], bs[0], g), als[0], g)
        x = _ceil_pool(x, 3, 2)
        x = prelu_g(conv_g(x, ks[1], bs[1], g), als[1], g)
        x = _ceil_pool(x, 3, 2)
        x = prelu_g(conv_g(x, ks[2], bs[2], g), als[2], g)
        x = ungroup(x, g) if g > 1 else x
        x = x.reshape(x.shape[0], -1)
        return jnp.dot(x, wf, preferred_element_type=jnp.float32)
    return tower


def make_onet(g):
    key = jax.random.PRNGKey(1)
    shapes = [(3, 3, 3, 32), (3, 3, 32, 64), (3, 3, 64, 64),
              (2, 2, 64, 128)]
    ks = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16) * .2
          for i, s in enumerate(shapes)]
    bs = [jnp.zeros((s[-1],), jnp.bfloat16) for s in shapes]
    als = [jnp.full((s[-1],), 0.25, jnp.bfloat16) for s in shapes]
    wf = jax.random.normal(key, (1152, 256), jnp.bfloat16) * 0.1

    def tower(x):
        x = ((x - 127.5) * 0.0078125).astype(jnp.bfloat16)
        x = group(x, g) if g > 1 else x
        x = prelu_g(conv_g(x, ks[0], bs[0], g), als[0], g)
        x = _ceil_pool(x, 3, 2)
        x = prelu_g(conv_g(x, ks[1], bs[1], g), als[1], g)
        x = _ceil_pool(x, 3, 2)
        x = prelu_g(conv_g(x, ks[2], bs[2], g), als[2], g)
        x = _ceil_pool(x, 2, 2)
        x = prelu_g(conv_g(x, ks[3], bs[3], g), als[3], g)
        x = ungroup(x, g) if g > 1 else x
        x = x.reshape(x.shape[0], -1)
        return jnp.dot(x, wf, preferred_element_type=jnp.float32)
    return tower


def make_pnet(g):
    key = jax.random.PRNGKey(2)
    shapes = [(3, 3, 3, 10), (3, 3, 10, 16), (3, 3, 16, 32)]
    ks = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16) * .2
          for i, s in enumerate(shapes)]
    bs = [jnp.zeros((s[-1],), jnp.bfloat16) for s in shapes]
    als = [jnp.full((s[-1],), 0.25, jnp.bfloat16) for s in shapes]
    kc = jax.random.normal(key, (1, 1, 32, 6), jnp.bfloat16) * 0.2

    def tower(x):
        x = ((x - 127.5) * 0.0078125).astype(jnp.bfloat16)
        x = group(x, g) if g > 1 else x
        x = prelu_g(conv_g(x, ks[0], bs[0], g), als[0], g)
        x = _ceil_pool(x, 2, 2)
        x = prelu_g(conv_g(x, ks[1], bs[1], g), als[1], g)
        x = prelu_g(conv_g(x, ks[2], bs[2], g), als[2], g)
        x = conv_g(x, kc, jnp.zeros((6,), jnp.bfloat16), g)
        x = ungroup(x, g) if g > 1 else x
        return x
    return tower


def timed(name, fn, x, iters=60):
    @jax.jit
    def chain(n, x):
        def body(i, acc):
            out = fn(x + (0.0 * acc).astype(x.dtype))
            return acc + jnp.mean(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, x))
    t0 = time.perf_counter()
    sync(chain(0, x))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, x))
    dt = (time.perf_counter() - t0 - ovh) / iters * 1e3
    print(json.dumps({"tower": name, "ms": round(dt, 3)}), flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(3)
    xr = jax.random.uniform(key, (8192, 24, 24, 3), jnp.float32, 0, 255)
    xo = jax.random.uniform(key, (4096, 48, 48, 3), jnp.float32, 0, 255)
    xp = jax.random.uniform(key, (64, 96, 96, 3), jnp.float32, 0, 255)

    # correctness: grouped == ungrouped
    r1, r4 = make_rnet(1), make_rnet(4)
    err = float(jnp.max(jnp.abs(r1(xr[:64]) - r4(xr[:64]))))
    print(json.dumps({"check": "rnet_g4_vs_g1", "max_err": err}), flush=True)

    for g in (1, 2, 4):
        timed(f"rnet_g{g}", make_rnet(g), xr)
    for g in (1, 2, 4):
        timed(f"onet_g{g}", make_onet(g), xo)
    for g in (1, 4, 8):
        timed(f"pnet96_g{g}", make_pnet(g), xp)


if __name__ == "__main__":
    main()
