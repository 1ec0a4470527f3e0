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


def _pullback_to_forward(h: int, w: int, A_rc: jnp.ndarray,
                         t_rc: jnp.ndarray, center: bool) -> jnp.ndarray:
    """Keras (row, col) PULL-BACK affine -> forward 2x3 for affine_warp.

    Keras hands its matrices to ``ndi.affine_transform``, which samples
    the INPUT at ``A @ out + t`` (output->input); ``affine_warp_batch``
    takes a forward (input->output) matrix and inverts internally, so
    the keras matrix must be inverted here — passing it through directly
    applies the inverse transform (e.g. shear by tan(s) the wrong way).

    ``center=True`` wraps in ``transform_matrix_offset_center``'s
    translation about (h/2 + 0.5, w/2 + 0.5) — keras' literal formula,
    NOT the pixel-grid centre ((h-1)/2): the +0.5 is part of the
    reference's output.
    """
    if center:
        o = jnp.array([h / 2.0 + 0.5, w / 2.0 + 0.5])
        t_rc = o - A_rc @ o + t_rc
    # (row, col) -> (x, y): swap both axes of A and the translation.
    swap = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    A_xy = swap @ A_rc @ swap
    t_xy = t_rc[::-1]
    # Forward = inverse of the pull-back: A_f = A_xy^-1, b_f = -A_f t_xy
    # (affine_warp's internal inversion then recovers the pull-back:
    # src = A_xy @ dst + t_xy exactly).
    a, b_, c_, d = A_xy[0, 0], A_xy[0, 1], A_xy[1, 0], A_xy[1, 1]
    det = a * d - b_ * c_
    A_f = jnp.array([[d, -b_], [-c_, a]]) / det
    b_f = -A_f @ t_xy
    return jnp.concatenate([A_f, b_f[:, None]], axis=1)


def _rotation_matrices(key, n, h, w, rg_deg):
    """keras random_rotation: pull-back [[cos, -sin], [sin, cos]] about
    the offset centre (keras/preprocessing/image.py)."""
    theta = jax.random.uniform(key, (n,), minval=-rg_deg, maxval=rg_deg)
    theta = jnp.deg2rad(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    A = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=1)
    return A, jnp.zeros((n, 2)), True


def _shear_matrices(key, n, h, w, intensity):
    """keras random_shear: pull-back [[1, -sin(s)], [0, cos(s)]] in
    (row, col), about the offset centre."""
    shear = jax.random.uniform(key, (n,), minval=-intensity, maxval=intensity)
    one = jnp.ones_like(shear)
    zero = jnp.zeros_like(shear)
    A = jnp.stack(
        [jnp.stack([one, -jnp.sin(shear)], -1),
         jnp.stack([zero, jnp.cos(shear)], -1)],
        axis=1,
    )
    return A, jnp.zeros((n, 2)), True


def _shift_matrices(key, n, h, w, frac):
    """keras random_shift: pull-back translation (tx rows, ty cols), NO
    centre offset (keras applies the raw translation matrix)."""
    kr, kc = jax.random.split(key)
    tr = jax.random.uniform(kr, (n,), minval=-frac, maxval=frac) * h
    tc = jax.random.uniform(kc, (n,), minval=-frac, maxval=frac) * w
    A = jnp.tile(jnp.eye(2)[None], (n, 1, 1))
    return A, jnp.stack([tr, tc], axis=-1), False


def _warp_batch(images, A_rc, t_rc, center):
    h, w = images.shape[1], images.shape[2]
    Ms = jax.vmap(lambda a, tt: _pullback_to_forward(h, w, a, tt, center))(
        A_rc, t_rc)
    # fill_mode='nearest' borders AND order=0 sampling: old keras
    # apply_transform interpolates with ndi order=0 (nearest pixel).
    return affine_warp_batch(images, Ms, (h, w), border="nearest",
                             interp="nearest")


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
            Al, tl, center = fn(kl, n, h, w, default)
            Ar, tr, _ = fn(kr, n, h, w, default)
            outs_l.append(_warp_batch(left, Al, tl, center))
            outs_r.append(_warp_batch(right, Ar, tr, center))
            outs_y.append(labels)
    return (jnp.concatenate(outs_l), jnp.concatenate(outs_r),
            jnp.concatenate(outs_y))
