import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from alink_tpu.ops.image import affine_warp_batch, affine_warp_batch_pallas

key = jax.random.PRNGKey(0)
N, H, W, C = 64, 160, 160, 3
imgs = jax.random.uniform(key, (N, H, W, C), jnp.float32) * 255.0
# face-alignment-like transforms: mild rotation+scale+translate
ang = jax.random.uniform(jax.random.PRNGKey(1), (N,), minval=-0.3, maxval=0.3)
s = jax.random.uniform(jax.random.PRNGKey(2), (N,), minval=0.8, maxval=1.3)
ca, sa = s*jnp.cos(ang), s*jnp.sin(ang)
tx = jax.random.uniform(jax.random.PRNGKey(3), (N,), minval=-10, maxval=10)
ty = jax.random.uniform(jax.random.PRNGKey(4), (N,), minval=-10, maxval=10)
Ms = jnp.stack([jnp.stack([ca, -sa, 24+tx], -1),
                jnp.stack([sa,  ca, 24+ty], -1)], 1)
out_size = (112, 112)

ref = affine_warp_batch(imgs, Ms, out_size)
got = affine_warp_batch_pallas(imgs, Ms, out_size)
err = float(jnp.abs(ref - got).max())
print("max abs err vs einsum path:", err)
assert err < 1.5, err

def timeit(f, *a, iters=50):
    f(*a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3

print(f"pallas warp: {timeit(affine_warp_batch_pallas, imgs, Ms, out_size):.3f} ms/64")
# nearest border too
ref2 = affine_warp_batch(imgs, Ms, out_size, border="nearest")
got2 = affine_warp_batch_pallas(imgs, Ms, out_size, border="nearest")
print("nearest err:", float(jnp.abs(ref2-got2).max()))
