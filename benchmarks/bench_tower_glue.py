"""Attribute R/O-Net tower time to conv vs pool vs PReLU vs flatten.

bench_packconv.py showed XLA's convs run at ~50 TF/s at these batch
shapes, yet the full towers measure 1.59 ms (R-Net) / 3.63 ms (O-Net)
against ~0.3/2.0 ms of conv — so the cost sits in the glue.  This bench
times each op class at the exact tower shapes (worst-case pipeline
budgets: 8192 24² crops, 4096 48² crops).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from alink_tpu.models.mtcnn import _ceil_pool


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timed(name, fn, *args, iters=40):
    @jax.jit
    def chain(n, *a):
        def body(i, acc):
            out = fn(a[0] + (0.0 * acc).astype(a[0].dtype), *a[1:])
            return acc + jnp.mean(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    sync(chain(2, *args))
    t0 = time.perf_counter()
    sync(chain(0, *args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(chain(iters, *args))
    dt = (time.perf_counter() - t0 - ovh) / iters * 1e3
    print(json.dumps({"op": name, "ms": round(dt, 3)}), flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    key = jax.random.PRNGKey(0)

    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def prelu(x, a):
        return jnp.where(x >= 0, x, a * x)

    # R-Net shapes (8192 crops)
    r_shapes = {
        "r_pool1_22x28": ((8192, 22, 22, 28), 3, 2),
        "r_pool2_9x48": ((8192, 9, 9, 48), 3, 2),
    }
    o_shapes = {
        "o_pool1_46x32": ((4096, 46, 46, 32), 3, 2),
        "o_pool2_21x64": ((4096, 21, 21, 64), 3, 2),
        "o_pool3_8x64": ((4096, 8, 8, 64), 2, 2),
    }
    def pool_slices(x, window, stride):
        """Ceil-mode max pool as a max over window² strided slices —
        elementwise maxes instead of reduce_window, so XLA can fuse the
        whole chain with neighbouring PReLU/cast glue."""
        h, w = x.shape[1], x.shape[2]
        oh = -(-max(h - window, 0) // stride) + 1
        ow = -(-max(w - window, 0) // stride) + 1
        ph = (oh - 1) * stride + window - h
        pw = (ow - 1) * stride + window - w
        if ph or pw:
            neg = jnp.finfo(x.dtype).min
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=neg)
        out = None
        for dy in range(window):
            for dx in range(window):
                sl = x[:, dy:dy + (oh - 1) * stride + 1:stride,
                       dx:dx + (ow - 1) * stride + 1:stride]
                out = sl if out is None else jnp.maximum(out, sl)
        return out

    def pool_pairmax(x, window, stride):
        """Ceil-mode max pool for stride 2 via reshape-pair maxes: no
        reduce_window, no strided slices — every op is a reshape, a
        contiguous slice, or an elementwise max, all freely fusable.
        out_i covers rows {2i, .., 2i+window-1}: the (n, 2) pair
        reshape gives rows {2i, 2i+1}; rows {2i+k} for k>=2 are
        contiguous shifts of the pair views."""
        assert stride == 2

        def pool1d(v, axis, size):
            oh = -(-max(size - window, 0) // stride) + 1
            need = (oh - 1) * stride + window
            neg = jnp.finfo(v.dtype).min
            pad_amt = need + (need % 2) - size
            if pad_amt:
                pw = [(0, 0)] * v.ndim
                pw[axis] = (0, pad_amt)
                v = jnp.pad(v, pw, constant_values=neg)
            shp = list(v.shape)
            shp[axis:axis + 1] = [shp[axis] // 2, 2]
            pairs = v.reshape(shp)
            evens = jax.lax.index_in_dim(pairs, 0, axis + 1, keepdims=False)
            m = jnp.max(pairs, axis=axis + 1)
            for k in range(2, window):
                # row 2i+k: k even -> evens shifted k//2; k odd -> from m?
                src = evens if k % 2 == 0 else jax.lax.index_in_dim(
                    pairs, 1, axis + 1, keepdims=False)
                sh = (k + 1) // 2 if k % 2 else k // 2
                sl = [slice(None)] * src.ndim
                sl[axis] = slice(sh, None)
                shifted = src[tuple(sl)]
                pw = [(0, 0)] * src.ndim
                pw[axis] = (0, sh)
                shifted = jnp.pad(shifted, pw, constant_values=neg)
                m = jnp.maximum(m, shifted)
            sl = [slice(None)] * m.ndim
            sl[axis] = slice(0, oh)
            return m[tuple(sl)]

        x = pool1d(x, 1, x.shape[1])
        return pool1d(x, 2, x.shape[2])

    for name, (shape, wnd, strd) in {**r_shapes, **o_shapes}.items():
        x = jax.random.normal(key, shape, jnp.bfloat16)
        timed(name, lambda v, w=wnd, s=strd: _ceil_pool(v, w, s), x)
        timed(name + "_slices",
              lambda v, w=wnd, s=strd: pool_slices(v, w, s), x)
        timed(name + "_pairmax",
              lambda v, w=wnd, s=strd: pool_pairmax(v, w, s), x)
        # Cross-check all three variants agree (ceil pool semantics).
        a = _ceil_pool(x, wnd, strd)
        for alt in (pool_slices(x, wnd, strd), pool_pairmax(x, wnd, strd)):
            assert alt.shape == a.shape, (name, alt.shape, a.shape)
            assert bool(jnp.all(alt == a)), name

    for name, shape in (("r_prelu_22x28", (8192, 22, 22, 28)),
                        ("o_prelu_46x32", (4096, 46, 46, 32))):
        x = jax.random.normal(key, shape, jnp.bfloat16)
        a = jnp.full((shape[-1],), 0.25, jnp.bfloat16)
        timed(name, prelu, x, a)

    # Flatten (3,3,64)->(576) + dense 576->128 (R-Net tail)
    xf = jax.random.normal(key, (8192, 3, 3, 64), jnp.bfloat16)
    wf = jax.random.normal(key, (576, 128), jnp.bfloat16) * 0.1
    timed("r_flatten_dense", lambda x, w: jnp.dot(
        x.reshape(x.shape[0], -1), w,
        preferred_element_type=jnp.float32), xf, wf)
    xo = jax.random.normal(key, (4096, 3, 3, 128), jnp.bfloat16)
    wo = jax.random.normal(key, (1152, 256), jnp.bfloat16) * 0.1
    timed("o_flatten_dense", lambda x, w: jnp.dot(
        x.reshape(x.shape[0], -1), w,
        preferred_element_type=jnp.float32), xo, wo)

    # O-Net conv shapes individually (bf16 out, matching the tower)
    for name, shape, cout in (("o_conv1_48", (4096, 48, 48, 3), 32),
                              ("o_conv2_23", (4096, 23, 23, 32), 64),
                              ("o_conv3_10", (4096, 10, 10, 64), 64),
                              ("o_conv4_4", (4096, 4, 4, 64), 128)):
        ks = 2 if name == "o_conv4_4" else 3
        x = jax.random.normal(key, shape, jnp.bfloat16)
        k = jax.random.normal(key, (ks, ks, shape[-1], cout),
                              jnp.bfloat16) * 0.2
        timed(name, conv, x, k)

    # mtcnn preprocess on the crop batch
    xp = jax.random.uniform(key, (8192, 24, 24, 3), jnp.float32, 0, 255)
    timed("r_preprocess", lambda x: (x - 127.5) * 0.0078125, xp)


if __name__ == "__main__":
    main()
