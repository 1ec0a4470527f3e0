"""Benchmark: batched one-pixel DE attack (ops/attack.py).

Reference hot path being replaced: code/attack.py:94-101 — DE run serially
per pair, crossing Python<->GPU maxiter x popsize times per pair
(SURVEY.md section 3.1 calls this the hottest loop in the system).
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.ops import attack as attack_ops


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def predict(params, left, right):
    s = jnp.mean(left, (1, 2, 3)) - jnp.mean(right, (1, 2, 3))
    p = jax.nn.sigmoid(s * params)
    return jnp.stack([1 - p, p], -1)


def main():
    key = jax.random.PRNGKey(0)
    n = 16
    left = jax.random.uniform(key, (n, 64, 64, 3), jnp.float32, 0, 255)
    right = jax.random.uniform(jax.random.fold_in(key, 1),
                               (n, 64, 64, 3), jnp.float32, 0, 255)
    targets = jnp.tile(jnp.array([[0.0, 1.0]]), (n, 1))
    # Reference attack_all config: pixel_count=40, maxiter=50, popsize=250.
    nl, _ = attack_ops.one_pixel_attack_pairs(
        predict, jnp.float32(0.05), left, right, targets, key)
    sync(nl)
    t0 = time.perf_counter()
    nl, _ = attack_ops.one_pixel_attack_pairs(
        predict, jnp.float32(0.06), left, right, targets,
        jax.random.fold_in(key, 2))
    sync(nl)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "pairs": n,
        "config": "40px/50iter/pop200",
        "batch_ms": round(dt * 1e3, 0),
        "ms_per_pair": round(dt * 1e3 / n, 1),
    }))


if __name__ == "__main__":
    main()
