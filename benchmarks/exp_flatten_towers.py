"""Is a vmapped R/O-Net tower slower than an explicitly flattened one?

VERDICT r3 #4 proposes flattening R/O-Net candidates across the image
batch "so lane occupancy is budget-independent".  Premise check: under
``jax.vmap`` the towers ALREADY see an (N, K, ...) batch that XLA
treats as an N*K conv batch — lane occupancy is set by the channel
width (28-128), not the per-image budget.  This probe times the R-Net
and O-Net towers three ways at the dense-scene candidate counts:

- ``vmap``: vmap over N images of a K-crop tower (the cascade's form),
- ``flat``: one explicit (N*K, ...) batch (the proposed rewrite),
- ``half``: the flat form at HALF the candidates (what compaction to
  the true aggregate count would buy at 50% occupancy).

If vmap == flat, the flattening rewrite is a measured negative; the
``half`` number quantifies what *runtime compaction* (dropping invalid
slots across the batch) would be worth instead.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.models import preprocess
from alink_tpu.models.mtcnn import ONet, RNet

N = 64 if jax.default_backend() == "tpu" else 2
K2 = 256   # dense-profile stage-2 crops per image (stage1_budget)
K3 = 128   # dense-profile stage-3 crops per image (stage2_budget)


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, iters=20):
    @jax.jit
    def chain(v, n):
        def body(i, carry):
            vv, acc = carry
            out = jnp.mean(jax.tree.leaves(fn(vv))[0].astype(jnp.float32))
            return vv + 0.0 * acc, acc + out
        return jax.lax.fori_loop(0, n, body, (v, jnp.float32(0.0)))[1]

    sync(chain(x, 1))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = max(time.perf_counter() - t0 - overhead, 1e-9) / iters
    ms64 = dt * 1000.0 * 64.0 / N
    print(json.dumps({"case": name, "ms_per_64imgs": round(ms64, 3)}),
          flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    rnet, onet = RNet(), ONet()
    rp = rnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    op = onet.init(jax.random.PRNGKey(1), jnp.zeros((1, 48, 48, 3)))

    for name, net, params, k, hw in (("rnet", rnet, rp, K2, 24),
                                     ("onet", onet, op, K3, 48)):
        x = jax.random.uniform(jax.random.PRNGKey(2), (N, k, hw, hw, 3),
                               jnp.float32, 0.0, 255.0)
        timed(f"{name}_vmap",
              lambda v, net=net, params=params: jax.vmap(
                  lambda crops: net.apply(params, preprocess.mtcnn(crops)))(v),
              x)
        xf = x.reshape(N * k, hw, hw, 3)
        timed(f"{name}_flat",
              lambda v, net=net, params=params: net.apply(
                  params, preprocess.mtcnn(v)), xf)
        timed(f"{name}_half",
              lambda v, net=net, params=params: net.apply(
                  params, preprocess.mtcnn(v)), xf[: N * k // 2])


if __name__ == "__main__":
    main()
