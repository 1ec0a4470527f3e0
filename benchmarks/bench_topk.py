"""top_k cost in the cascade's decode path, and cheaper alternatives.

The P-Net stage measures 1.97 ms/64 images while its conv towers are
immeasurably cheap — generate_bbox runs lax.top_k over every pyramid
level's cell grid (up to 43^2 cells) and select_topk sorts the merged
budget.  Candidates: jax.lax.approx_max_k (TPU MIPS hardware path) and
a padded reshape+segment-max exact two-stage top-k.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, *args, iters=100):
    @jax.jit
    def chain(n, *a):
        def body(i, acc):
            out = fn(a[0] + (0.0 * acc).astype(a[0].dtype), *a[1:])
            return acc + jnp.mean(out[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, *args))
    t0 = time.perf_counter()
    sync(chain(0, *args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, *args))
    dt = (time.perf_counter() - t0 - ovh) / iters * 1e3
    print(json.dumps({"op": name, "ms": round(dt, 4)}), flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(0)

    # (batch, cells) -> k, the real decode shapes at 160^2 images:
    # pyramid grids 43^2, 30^2, 21^2... and the merged stage-1 budget.
    shapes = [
        ("pnet_L0_1849c_k64", (64, 1849), 64),
        ("pnet_L2_441c_k64", (64, 441), 64),
        ("merged_448c_k128", (64, 448), 128),
        ("stage2_128c_k64", (64, 128), 64),
    ]
    for name, shape, k in shapes:
        x = jax.random.normal(key, shape, jnp.float32)
        timed(f"topk_{name}",
              lambda v, kk=k: jax.lax.top_k(v, kk), x)
        timed(f"approx_{name}",
              lambda v, kk=k: jax.lax.approx_max_k(v, kk), x)
        timed(f"sortfull_{name}",
              lambda v, kk=k: (jnp.sort(v, axis=-1),), x)

    # batched argmax (the best-face pick) for reference
    x = jax.random.normal(key, (64, 448), jnp.float32)
    timed("argmax_448", lambda v: (jnp.argmax(v, axis=-1),), x)


if __name__ == "__main__":
    main()
