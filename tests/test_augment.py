"""Tests for paired augmentation (ops/augment.py vs code/helpers.py:114-141)."""

import jax
import jax.numpy as jnp

from alink_tpu.ops import augment


def _batch(key, n=4, size=24):
    kl, kr = jax.random.split(key)
    left = jax.random.uniform(kl, (n, size, size, 3)) * 255.0
    right = jax.random.uniform(kr, (n, size, size, 3)) * 255.0
    labels = jnp.eye(2)[jnp.arange(n) % 2]
    return left, right, labels


def test_output_layout_matches_reference():
    """original + rotation + shear + shift per factor (helpers.py:119-138)."""
    left, right, labels = _batch(jax.random.PRNGKey(0))
    al, ar, ay = augment.augment_pairs(jax.random.PRNGKey(1), left, right,
                                       labels)
    assert al.shape == (16, 24, 24, 3)
    assert ar.shape == (16, 24, 24, 3)
    assert ay.shape == (16, 2)
    # The first block is the untouched originals.
    assert jnp.array_equal(al[:4], left)
    assert jnp.array_equal(ar[:4], right)
    assert jnp.array_equal(ay, jnp.tile(labels, (4, 1)))


def test_variant_toggles():
    left, right, labels = _batch(jax.random.PRNGKey(2))
    al, _, _ = augment.augment_pairs(
        jax.random.PRNGKey(3), left, right, labels,
        use_rotation=True, use_shear=False, use_shift=False,
    )
    assert al.shape[0] == 8  # original + rotation only


def test_factor_repeats():
    left, right, labels = _batch(jax.random.PRNGKey(4))
    al, _, ay = augment.augment_pairs(jax.random.PRNGKey(5), left, right,
                                      labels, factor=2)
    assert al.shape[0] == 32
    assert ay.shape[0] == 32


def test_augmented_images_stay_in_range():
    """nearest-border warps cannot create values outside the input range."""
    left, right, labels = _batch(jax.random.PRNGKey(6))
    al, ar, _ = augment.augment_pairs(jax.random.PRNGKey(7), left, right,
                                      labels)
    assert float(jnp.min(al)) >= 0.0
    assert float(jnp.max(al)) <= 255.0
    # And the transforms actually moved pixels.
    assert not jnp.array_equal(al[4:8], left)


def test_shift_translates_content():
    """A pure shift of a delta image moves its peak by the drawn offset."""
    img = jnp.zeros((1, 33, 33, 3)).at[0, 16, 16, :].set(255.0)
    labels = jnp.eye(2)[:1]
    al, _, _ = augment.augment_pairs(
        jax.random.PRNGKey(8), img, img, labels,
        use_rotation=False, use_shear=False, use_shift=True,
    )
    shifted = al[1, ..., 0]
    peak = jnp.unravel_index(jnp.argmax(shifted), shifted.shape)
    assert float(shifted.max()) > 0
    # Shift fraction 0.2 of 33 px => peak stays within ~7 px of center.
    assert abs(int(peak[0]) - 16) <= 8
    assert abs(int(peak[1]) - 16) <= 8


def test_keras_pullback_matches_ndimage_oracle():
    """The augment transforms must equal keras apply_transform exactly:
    the SAME (row, col) pull-back matrix given to scipy.ndimage
    affine_transform with order=0 + mode='nearest' (what old Keras'
    random_rotation/shear/shift do) must reproduce our warp pixel for
    pixel."""
    import numpy as np
    from scipy import ndimage as ndi

    from alink_tpu.ops.augment import _pullback_to_forward
    from alink_tpu.ops.image import affine_warp_batch

    rng = np.random.default_rng(0)
    h, w = 20, 16
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)

    theta = 0.31
    shear = 0.2
    cases = [
        ("rotation",
         np.array([[np.cos(theta), -np.sin(theta)],
                   [np.sin(theta), np.cos(theta)]]),
         np.zeros(2), True),
        ("shear",
         np.array([[1.0, -np.sin(shear)], [0.0, np.cos(shear)]]),
         np.zeros(2), True),
        ("shift", np.eye(2), np.array([3.2, -2.6]), False),
    ]
    for name, A_rc, t_rc, center in cases:
        # keras side: transform_matrix_offset_center about (d/2 + 0.5).
        A_full, t_full = A_rc, t_rc
        if center:
            o = np.array([h / 2.0 + 0.5, w / 2.0 + 0.5])
            t_full = o - A_rc @ o + t_rc
        want = np.stack([
            ndi.affine_transform(img[..., c], A_full, offset=t_full,
                                 order=0, mode="nearest")
            for c in range(3)
        ], axis=-1)
        M = _pullback_to_forward(h, w, jnp.asarray(A_rc, jnp.float32),
                                 jnp.asarray(t_rc, jnp.float32), center)
        got = np.asarray(affine_warp_batch(
            jnp.asarray(img)[None], jnp.asarray(M)[None], (h, w),
            border="nearest", interp="nearest")[0])
        assert np.array_equal(got, want), (
            f"{name}: {np.abs(got - want).max()} max diff, "
            f"{(got != want).mean():.3f} frac differing")
