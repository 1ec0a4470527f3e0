"""r34 pipeline batch sweep — the configuration chasing the 10k target.

Batch 256 is the r100-measured sweet spot; the shallower r34 has a
smaller HBM working set, so its optimum may sit higher.  Times the
full fused pipeline at several batches and the r34 embed alone.
"""

import json
import time

import jax
import jax.numpy as jnp

SIZE = 160


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, batch, iters=20):
    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            out = jnp.mean(fn(im).astype(jnp.float32))
            return im + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    sync(chain(x, 1))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ovh) / iters
    print(json.dumps({"case": name, "batch": batch,
                      "faces_per_sec": round(batch / dt, 1),
                      "ms_per_64": round(dt * 1000 * 64 / batch, 3)}),
          flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
    from alink_tpu.models import ArcFaceResNet34

    emb = ArcFaceResNet34()
    ep = emb.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    cp = init_cascade_params(jax.random.PRNGKey(1))
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    fm = FaceModel(ep, cp, cfg, embedder=emb)

    for batch in (256, 384, 512):
        x = jax.random.uniform(jax.random.PRNGKey(2),
                               (batch, SIZE, SIZE, 3), jnp.float32, 0, 255)
        timed("r34_pipeline", lambda im: fm.pipeline(ep, cp, im), x, batch)
    chips = jax.random.uniform(jax.random.PRNGKey(3), (256, 112, 112, 3),
                               jnp.float32, 0, 255)
    timed("r34_embed_only", lambda im: emb.apply(ep, im), chips, 256)


if __name__ == "__main__":
    main()
