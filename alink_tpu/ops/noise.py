"""The A2-LINK noise bank as pure batched JAX functions.

Reference: code/noise.py.  The reference applies each noise with a Python
loop over individual images (noise.py:20-24); here every channel is a
single vmapped/jit'd op over the whole batch, with reference-matching
statistics:

- ``gaussian``    — additive N(mean=10, sigma=sqrt(10)) (noise.py:33-45).
- ``salt_pepper`` — fixed-count scatter of salt(=1)/pepper(=0) values at
  uniformly random positions, s_vs_p=0.5, amount=0.004 (noise.py:48-65).
  Two reference quirks are preserved deliberately: positions are drawn
  with replacement via ``randint(0, dim-1)`` (range [0, dim-2], so the
  last row/column/channel is never hit), and salt is the value ``1`` even
  on [0, 255] images.
- ``poisson``     — ``Poisson(x * vals) / vals`` with
  ``vals = 2**ceil(log2(n_unique(x)))`` (noise.py:68-76); the unique-value
  count is computed with a sort (jit-safe) instead of ``np.unique``.
- ``speckle``     — multiplicative ``x + x * N(0, 1/15)`` (noise.py:79-88).
- ``perlin``      — multi-octave gradient noise with quintic interpolation
  (noise.py:91-150): octaves (56, 32, 16) when size % 56 == 0 else
  (50, 30, 15), per-image random gradient grids, un-normalised amplitude,
  broadcast over channels — the per-patch Python loops of
  ``individualFilterNoise`` become one gather + blend.
- ``plain``       — identity (the base Noise class, noise.py:17-30).

The adversarial channel (noise.py:171-188) lives in ``alink_tpu.ops.attack``
since it needs a model; ``alink_tpu.active.committee`` composes the full
bank the way ``committee.Bagging.attackModel`` does.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

NoiseFn = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]


def plain(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Identity noise (base class behaviour, noise.py:17-30)."""
    del key
    return images


def _float_dtype(images: jnp.ndarray) -> jnp.dtype:
    """Noise is float arithmetic: keep float inputs' dtype, compute in
    f32 for integer images (the pool is uint8-resident; drawing normal
    samples in uint8 would raise, and int round-trips would wrap)."""
    return (images.dtype if jnp.issubdtype(images.dtype, jnp.floating)
            else jnp.dtype(jnp.float32))


def gaussian(
    key: jax.Array, images: jnp.ndarray, mean: float = 10.0, var: float = 10.0
) -> jnp.ndarray:
    """Additive Gaussian noise (noise.py:33-45)."""
    sigma = var**0.5
    dt = _float_dtype(images)
    return images.astype(dt) + mean + sigma * jax.random.normal(
        key, images.shape, dtype=dt
    )


def salt_pepper(
    key: jax.Array,
    images: jnp.ndarray,
    s_vs_p: float = 0.5,
    amount: float = 0.004,
) -> jnp.ndarray:
    """Fixed-count salt & pepper noise (noise.py:48-65).

    Per image: ceil(amount*size*s_vs_p) salt points set to 1 and
    ceil(amount*size*(1-s_vs_p)) pepper points set to 0, positions drawn
    independently per axis with replacement in [0, dim-2] (the reference's
    ``randint(0, i - 1)``).
    """
    n, h, w, c = images.shape
    size = h * w * c
    num_salt = int(math.ceil(amount * size * s_vs_p))
    num_pepper = int(math.ceil(amount * size * (1.0 - s_vs_p)))

    def one(img, k):
        ks, kp = jax.random.split(k)

        def coords(kk, count):
            k1, k2, k3 = jax.random.split(kk, 3)
            # randint high is exclusive; reference uses randint(0, dim-1).
            ys = jax.random.randint(k1, (count,), 0, max(h - 1, 1))
            xs = jax.random.randint(k2, (count,), 0, max(w - 1, 1))
            cs = jax.random.randint(k3, (count,), 0, max(c - 1, 1))
            return ys, xs, cs

        sy, sx, sc = coords(ks, num_salt)
        py, px, pc = coords(kp, num_pepper)
        img = img.at[sy, sx, sc].set(1.0)
        img = img.at[py, px, pc].set(0.0)
        return img

    return jax.vmap(one)(images, jax.random.split(key, n))


def poisson(
    key: jax.Array,
    images: jnp.ndarray,
    assume_uint8: bool = True,
    exact: bool = False,
) -> jnp.ndarray:
    """Poisson shot noise with data-dependent scaling (noise.py:68-76).

    ``vals = 2**ceil(log2(n_unique(x)))``.  With ``assume_uint8`` (the
    reference's images are cv2-decoded uint8, readDFW.py:82) the unique
    count is 256 equality reductions — an O(n) pass instead of a 150K-
    element per-image sort, which dominated the selection round.

    ``exact=False`` replaces the Poisson sampler with its Gaussian limit
    ``round(lam + sqrt(lam) * z)`` clipped at 0: mean and variance are
    exact, and lam = pixel * vals >= 256 for every nonzero uint8 pixel,
    where the Poisson is Gaussian to ~lam**-0.5 = 6% skew or better —
    while dropping the rejection-sampler cost (measured 91 -> ~5 ms per
    256 images at 224x224).
    """

    def one(img, k):
        img = img.astype(_float_dtype(img))
        if assume_uint8:
            levels = jnp.arange(256, dtype=jnp.float32)
            flat = img.reshape(-1, 1).astype(jnp.float32)
            present = jnp.any(jnp.round(flat) == levels[None, :], axis=0)
            n_unique = jnp.maximum(jnp.sum(present), 1)
        else:
            flat = jnp.sort(img.reshape(-1))
            n_unique = 1 + jnp.sum(flat[1:] != flat[:-1])
        vals = 2.0 ** jnp.ceil(jnp.log2(n_unique.astype(jnp.float32)))
        lam = jnp.maximum(img * vals, 0.0)
        if exact:
            noisy = jax.random.poisson(k, lam).astype(img.dtype)
        else:
            z = jax.random.normal(k, img.shape, dtype=jnp.float32)
            noisy = jnp.maximum(
                jnp.round(lam + jnp.sqrt(lam) * z), 0.0).astype(img.dtype)
        return noisy / vals

    return jax.vmap(one)(images, jax.random.split(key, images.shape[0]))


def speckle(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Multiplicative speckle noise (noise.py:79-88)."""
    dt = _float_dtype(images)
    images = images.astype(dt)
    g = jax.random.normal(key, images.shape, dtype=dt) / 15.0
    return images + images * g


def _quintic(t: jnp.ndarray) -> jnp.ndarray:
    """Perlin's quintic fade t^3 (t (6t - 15) + 10) (noise.py:117)."""
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _perlin_octave(key: jax.Array, size: int, ns: int) -> jnp.ndarray:
    """One gradient-noise octave of ``individualFilterNoise`` (noise.py:95-140).

    For a pixel at (row u_g = i*ns + u, col v_g = j*ns + v) the value is the
    quintic blend of the four corner dot products

        d00 = (v,      u     ) . g[i,   j  ]
        d01 = (v - ns, u     ) . g[i,   j+1]
        d10 = (v,      u - ns) . g[i+1, j  ]
        d11 = (v - ns, u - ns) . g[i+1, j+1]

    with weights fade(u/ns) x fade(v/ns) — the un-normalised offsets match
    the reference exactly (its amplitude scales with ns).

    Grid sizing: ceil(size/ns)+1 gradient nodes per axis.  For sizes
    divisible by ``ns`` this equals the reference's ``size/ns + 1``
    (identical fields); for indivisible sizes the reference CRASHES
    (its ``m.reshape(nc, ns, nc, ns)``, noise.py:130, fails — e.g. the
    ALINK_arc 112x112 config with octave 32), whereas the ceil grid
    gives the tail band a proper gradient cell instead.
    """
    nc = -(-size // ns)
    phi = jax.random.uniform(key, (nc + 1, nc + 1), minval=0.0, maxval=2 * jnp.pi)
    g = jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)  # (nc+1, nc+1, 2) [x, y]

    r = jnp.arange(size)
    cell = r // ns  # (size,)
    local = (r % ns).astype(jnp.float32)  # (size,)
    fade = _quintic(local / ns)

    # Corner gradients gathered to full resolution: (size, size, 2).
    def corner(di, dj):
        return g[cell + di][:, cell + dj]

    u = local[:, None]  # row-local offset, broadcast over cols
    v = local[None, :]  # col-local offset, broadcast over rows
    d00 = v * corner(0, 0)[..., 0] + u * corner(0, 0)[..., 1]
    d01 = (v - ns) * corner(0, 1)[..., 0] + u * corner(0, 1)[..., 1]
    d10 = v * corner(1, 0)[..., 0] + (u - ns) * corner(1, 0)[..., 1]
    d11 = (v - ns) * corner(1, 1)[..., 0] + (u - ns) * corner(1, 1)[..., 1]

    fu = fade[:, None]
    fv = fade[None, :]
    top = d00 + fv * (d01 - d00)
    bot = d10 + fv * (d11 - d10)
    return top + fu * (bot - top)


def perlin_field(key: jax.Array, size: int) -> jnp.ndarray:
    """Multi-octave Perlin field for one image (noise.py:142-150)."""
    octaves = (56, 32, 16) if size % 56 == 0 else (50, 30, 15)
    keys = jax.random.split(key, len(octaves))
    return sum(_perlin_octave(k, size, ns) for k, ns in zip(keys, octaves))


def perlin(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Additive Perlin noise, same field on all 3 channels (noise.py:142-150).

    Requires square images (the reference asserts row == col).
    """
    n, h, w, _ = images.shape
    if h != w:
        raise ValueError(f"perlin requires square images, got {h}x{w}")
    fields = jax.vmap(lambda k: perlin_field(k, h))(jax.random.split(key, n))
    return images + fields[..., None]


# Registry mirroring get_relevant_noise (noise.py:191-205).  The
# "adversarial" channel is registered by alink_tpu.active.committee since it
# closes over a model.
NOISE_FNS: dict[str, NoiseFn] = {
    "gaussian": gaussian,
    "saltpepper": salt_pepper,
    "poisson": poisson,
    "speckle": speckle,
    "perlin": perlin,
    "plain": plain,
}


def get_relevant_noise(name: str) -> NoiseFn:
    """Name -> noise fn (noise.py:191-205 parity, same error contract)."""
    try:
        return NOISE_FNS[name.lower()]
    except KeyError:
        raise NotImplementedError(f"{name} noise is not implemented!") from None


def add_pair_noise(
    fn: NoiseFn, key: jax.Array, left: jnp.ndarray, right: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply one noise channel to both halves of a pair batch
    (Noise.addPairNoise, noise.py:26-30)."""
    kl, kr = jax.random.split(key)
    return fn(kl, left), fn(kr, right)


@partial(jax.jit, static_argnames=("names",))
def apply_noise_bank(
    names: tuple[str, ...],
    key: jax.Array,
    left: jnp.ndarray,
    right: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fan a bank of non-adversarial noises over a pair batch.

    Replaces the Python loop in committee.Bagging.attackModel
    (code/committee.py:28-37).  Returns arrays of shape
    ``(len(names), N, H, W, C)`` for the left and right halves.
    """
    keys = jax.random.split(key, len(names))
    lefts, rights = [], []
    for name, k in zip(names, keys):
        nl, nr = add_pair_noise(get_relevant_noise(name), k, left, right)
        lefts.append(nl)
        rights.append(nr)
    return jnp.stack(lefts), jnp.stack(rights)
