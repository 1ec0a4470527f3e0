"""Stem space-to-depth measurement (VERDICT r2 #6 lever a).

Times the keras_vggface 7x7/s2 stem conv in both formulations plus the
full VGGFaceResNet50 forward (which now uses the s2d stem), at the
selection-round shapes.  Prior record (BENCHMARKS.md stage ablation,
batch 256): stem 1.9 ms (32 TF/s), backbone 56 TF/s.
"""

import time

import jax
import jax.numpy as jnp

from alink_tpu.models import VGGFaceResNet50
from alink_tpu.models.resnet import _StemConv

BATCH = 256


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, x, flops, iters=30):
    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            return im + 0.0 * acc, acc + jnp.mean(
                fn(im).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    sync(chain(x, 1))
    t0 = time.perf_counter()
    sync(chain(x, 0))
    ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(x, iters))
    dt = (time.perf_counter() - t0 - ov) / iters
    print(f"{name:22s} {dt * 1e3:7.2f} ms/{BATCH}  "
          f"{flops / dt / 1e12:6.1f} TF/s", flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 224, 224, 3),
                           jnp.float32, 0.0, 255.0)
    stem = _StemConv(64)
    sp = stem.init(jax.random.PRNGKey(1), x)
    k = sp["params"]["kernel"]
    stem_flops = BATCH * 112 * 112 * 64 * 7 * 7 * 3 * 2

    def plain(im):
        return jax.lax.conv_general_dilated(
            im.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
            "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timed("stem_plain_7x7s2", plain, x, stem_flops)
    timed("stem_s2d_4x4s1", lambda im: stem.apply(sp, im), x, stem_flops)

    bb = VGGFaceResNet50()
    bp = bb.init(jax.random.PRNGKey(2), x[:1])
    bb_flops = BATCH * 7.7e9  # ~3.85 GMACs for ResNet50 @224
    timed("backbone_s2d", lambda im: bb.apply(bp, im), x, bb_flops)

    # Clean A/B in the same harness: identical params, plain-stem apply.
    plain_bb = VGGFaceResNet50(s2d_stem=False)
    timed("backbone_plain", lambda im: plain_bb.apply(bp, im), x, bb_flops)


if __name__ == "__main__":
    main()
