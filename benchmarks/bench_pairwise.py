"""Benchmark: fused pairwise scoring engine (ops/pairwise.py).

Reference hot loop being replaced: utilities/generateMatrixDFW.py:30-35
(7,771 row-by-row predict calls for the 60.4M-pair DFW matrix).
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.models import SiameseHead
from alink_tpu.ops import pairwise


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    head = SiameseHead()
    d = 2048
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, d)),
                       jnp.zeros((1, d)))
    on_tpu = jax.default_backend() == "tpu"
    n = 4096 if on_tpu else 256
    rows = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    cols = jax.random.normal(jax.random.PRNGKey(2), (n, d))
    results = {}
    for name, fn in (("pallas", pairwise.score_matrix),
                     ("xla", pairwise.score_matrix_xla)):
        sync(fn(params, rows, cols))
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(params, rows, cols))
            dt = min(dt, time.perf_counter() - t0)
        results[name] = {"ms": round(dt * 1e3, 1),
                         "mpairs_per_s": round(n * n / dt / 1e6, 1)}
    dfw_seconds = 7771 * 7771 / (results["pallas"]["mpairs_per_s"] * 1e6)
    results["dfw_matrix_seconds"] = round(dfw_seconds, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
