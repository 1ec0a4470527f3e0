"""Stateless paired data augmentation.

Reference: ``code/helpers.py:114-141`` (``augment_data``) — for every pair it
appends the original plus a randomly-rotated (20 deg), randomly-sheared
(0.2 intensity) and randomly-shifted (0.2 fraction) copy, applying *the same
kind* of transform to both halves of the pair, with keras
``fill_mode='nearest'`` borders.  The reference runs this as a per-image
Python loop on the host; here each variant is one batched affine warp.

Departure noted per SURVEY.md section 7: the reference draws *independent*
random parameters for the left and right half of a pair (it calls
``random_rotation`` separately per half, helpers.py:127-138) despite the
"same transformations together" comment; we preserve that behaviour —
independent draws per half — since that is what the algorithm actually saw.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from alink_tpu.ops.image import affine_warp_batch


def _center_affine(h: int, w: int, A: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Forward 2x3 matrix applying ``A`` about the image center plus shift
    ``t`` (keras transform_matrix_offset_center semantics)."""
    cx = (w - 1) * 0.5
    cy = (h - 1) * 0.5
    center = jnp.array([cx, cy])
    b = center - A @ center + t
    return jnp.concatenate([A, b[:, None]], axis=1)


def _rotation_matrices(key, n, h, w, rg_deg):
    theta = jax.random.uniform(key, (n,), minval=-rg_deg, maxval=rg_deg)
    theta = jnp.deg2rad(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    A = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=1)
    t = jnp.zeros((n, 2))
    return A, t


def _shear_matrices(key, n, h, w, intensity):
    shear = jax.random.uniform(key, (n,), minval=-intensity, maxval=intensity)
    one = jnp.ones_like(shear)
    zero = jnp.zeros_like(shear)
    # keras shear matrix [[1, -sin(s)], [0, cos(s)]] in (row, col) space ->
    # transposed into our (x, y) convention.
    A = jnp.stack(
        [jnp.stack([jnp.cos(shear), zero], -1),
         jnp.stack([-jnp.sin(shear), one], -1)],
        axis=1,
    )
    t = jnp.zeros((n, 2))
    return A, t


def _shift_matrices(key, n, h, w, frac):
    kx, ky = jax.random.split(key)
    tx = jax.random.uniform(kx, (n,), minval=-frac, maxval=frac) * w
    ty = jax.random.uniform(ky, (n,), minval=-frac, maxval=frac) * h
    A = jnp.tile(jnp.eye(2)[None], (n, 1, 1))
    return A, jnp.stack([tx, ty], axis=-1)


def _warp_batch(images, A, t):
    h, w = images.shape[1], images.shape[2]
    Ms = jax.vmap(lambda a, tt: _center_affine(h, w, a, tt))(A, t)
    return affine_warp_batch(images, Ms, (h, w), border="nearest")


_VARIANTS = {
    "rotation": (_rotation_matrices, 20.0),
    "shear": (_shear_matrices, 0.2),
    "shift": (_shift_matrices, 0.2),
}


@partial(jax.jit, static_argnames=("factor", "use_rotation", "use_shear",
                                   "use_shift"))
def augment_pairs(
    key: jax.Array,
    left: jnp.ndarray,
    right: jnp.ndarray,
    labels: jnp.ndarray,
    factor: int = 1,
    use_rotation: bool = True,
    use_shear: bool = True,
    use_shift: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand a labelled pair batch with augmented copies.

    Matches ``augment_data``'s output layout (helpers.py:119-141): for each
    repetition of ``factor``, the original pair plus one copy per enabled
    transform, labels repeated alongside.  Output order is grouped by
    variant (original block, rotation block, ...) rather than interleaved —
    downstream training shuffles anyway (code/siamese.py:86-92).
    """
    n, h, w, _ = left.shape
    outs_l, outs_r, outs_y = [], [], []
    names = [name for name, on in
             [("rotation", use_rotation), ("shear", use_shear),
              ("shift", use_shift)] if on]
    for rep in range(factor):
        outs_l.append(left)
        outs_r.append(right)
        outs_y.append(labels)
        for vi, name in enumerate(names):
            fn, default = _VARIANTS[name]
            kl, kr = jax.random.split(
                jax.random.fold_in(key, rep * len(names) + vi)
            )
            Al, tl = fn(kl, n, h, w, default)
            Ar, tr = fn(kr, n, h, w, default)
            outs_l.append(_warp_batch(left, Al, tl))
            outs_r.append(_warp_batch(right, Ar, tr))
            outs_y.append(labels)
    return (jnp.concatenate(outs_l), jnp.concatenate(outs_r),
            jnp.concatenate(outs_y))
