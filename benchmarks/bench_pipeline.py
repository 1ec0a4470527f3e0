"""Benchmark: full detect -> align -> embed pipeline (faces/sec/chip).

BASELINE.json's headline metric ("detected+aligned+embedded 112x112
faces/sec/chip").  Runs the fixed-budget MTCNN cascade on a raw image
batch, aligns the best face per image to the ArcFace template, and embeds
it with LResNet100E-II — all jit'd, weights random (throughput is
weight-independent).

Reference equivalent: MTCNN over an image pyramid in Python/MXNet at
batch=1 with per-scale host NMS (mtcnn_detector.py:307-513) + batch=1
MXNet embedding (face_model.py:39).
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet100


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 2  # measured batch sweep: 64/128/256 =
    # 2471/2503/2542 faces/s (embed amortises better at larger batch)
    size = 160  # typical pre-crop face image
    embedder = ArcFaceResNet100()
    eparams = embedder.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3)))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3),
                           jnp.float32, 0.0, 255.0)
    iters = 20 if on_tpu else 1

    # Thresholds 0 with random weights keep every budget slot full, so
    # each profile measures its own budget's worst case.
    for name, cfg in (
        ("typical", CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))),
        ("worst_case",
         CascadeConfig.worst_case(thresholds=(0.0, 0.0, 0.0))),
    ):
        fm = FaceModel(eparams, cparams, cfg, embedder=embedder)

        # Chain iterations inside one jit (scalar fold-back serialises
        # them) and subtract the dispatch+fetch latency measured with
        # n=0: the remote-device tunnel costs tens of ms per launch,
        # which would otherwise dominate a per-call loop.
        @jax.jit
        def chain(imgs, n):
            def body(i, carry):
                im, acc = carry
                feats = fm.pipeline(eparams, cparams, im)
                return im + 0.0 * acc, acc + jnp.mean(feats)
            return jax.lax.fori_loop(0, n, body,
                                     (imgs, jnp.float32(0.0)))[1]

        sync(chain(x, 1))  # compile + warm-up
        t0 = time.perf_counter()
        sync(chain(x, 0))
        overhead = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain(x, iters))
        dt = max(time.perf_counter() - t0 - overhead, 1e-9)
        faces_per_sec = batch * iters / dt
        print(json.dumps({
            "metric": "detect_align_embed_throughput",
            "profile": name,
            "image_size": size,
            "batch": batch,
            "value": round(faces_per_sec, 1),
            "unit": "faces/sec/chip",
        }), flush=True)


if __name__ == "__main__":
    main()
