"""Fused pipeline compile time + throughput with the scanned embedder.

The worst_case-budget pipeline program blew the 1700s cold-cache compile
budget on the remote AOT service (round 2).  The embedder's 49 unrolled
IR units are the bulk of that HLO; scan_units shrinks the embed HLO
~3.5x (bench_scan_embed).  This measures the fused detect->align->embed
program both ways: compile seconds and faces/s, typical budgets.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet100, stack_ir_params


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
    except Exception:
        pass
    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 2
    sizes = (3, 13, 30, 3) if on_tpu else (1, 1, 1, 1)
    iters = 20 if on_tpu else 1
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, 160, 160, 3),
                           jnp.float32, 0.0, 255.0)
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    base = ArcFaceResNet100(stage_sizes=sizes)
    pu = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    for name, embedder, eparams in (
        ("unrolled", base, pu),
        ("scan_units",
         ArcFaceResNet100(stage_sizes=sizes, scan_units=True),
         stack_ir_params(pu, sizes)),
    ):
        fm = FaceModel(eparams, cparams, cfg, embedder=embedder)

        @jax.jit
        def chain(ep, imgs, n, fm=fm):
            def body(i, carry):
                im, acc = carry
                feats = fm.pipeline(ep, cparams, im)
                return im + 0.0 * acc, acc + jnp.mean(feats)
            return jax.lax.fori_loop(0, n, body,
                                     (imgs, jnp.float32(0.0)))[1]

        t0 = time.perf_counter()
        sync(chain(eparams, x, 1))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain(eparams, x, 0))
        overhead = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain(eparams, x, iters))
        dt = max(time.perf_counter() - t0 - overhead, 1e-9)
        print(json.dumps({
            "metric": "detect_align_embed_throughput", "variant": name,
            "profile": "typical", "batch": batch,
            "value": round(batch * iters / dt, 1),
            "unit": "faces/sec/chip", "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
