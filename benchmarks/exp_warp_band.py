"""Band sweep for the transposed warp kernel.

The H contraction's K dim = ``band``; bilinear taps of a 16-row output
tile only span ~2 + 16*scale source rows, so K=128 carries ~4x
redundant contraction for face-alignment transforms.  Sweep band to
find the MXU-efficiency / tap-span sweet spot (overflow tiles fall
back to the exact full-height pass, so all points are exact).
"""
import time
import jax, jax.numpy as jnp

from alink_tpu.ops.image import affine_warp_batch, affine_warp_batch_pallas

def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    N, H, W, C = 64, 160, 160, 3
    k = jax.random.PRNGKey
    imgs = jax.random.uniform(k(0), (N, H, W, C), jnp.float32) * 255.0
    ang = jax.random.uniform(k(1), (N,), minval=-0.3, maxval=0.3)
    s = jax.random.uniform(k(2), (N,), minval=0.8, maxval=1.3)
    ca, sa = s * jnp.cos(ang), s * jnp.sin(ang)
    tx = jax.random.uniform(k(3), (N,), minval=-10, maxval=10)
    ty = jax.random.uniform(k(4), (N,), minval=-10, maxval=10)
    Ms = jnp.stack([jnp.stack([ca, -sa, 24 + tx], -1),
                    jnp.stack([sa, ca, 24 + ty], -1)], 1)
    out_size = (112, 112)
    ref = affine_warp_batch(imgs, Ms, out_size)

    for band in (128, 64, 32, 16):
        f = jax.jit(lambda im, M: affine_warp_batch_pallas(
            im, M, out_size, band=band))
        got = f(imgs, Ms)
        err = float(jnp.abs(ref - got).max())
        got.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            r = f(imgs, Ms)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 50 * 1e3
        print(f"band={band:4d}  {dt:6.3f} ms/64  err={err:.3f}", flush=True)

if __name__ == "__main__":
    main()
