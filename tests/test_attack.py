"""One-pixel DE attack + FGSM tests (reference: code/attack.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from alink_tpu.ops.attack import (fgsm_pairs, one_pixel_attack_pairs,
                                  one_pixel_attack_pairs_proxy, perturb_image)


def test_perturb_image_semantics():
    # attack.py:5-29 — floor coords, overwrite RGB at img[x_pos, y_pos].
    img = jnp.zeros((4, 6, 3))
    xs = jnp.array([[1.7, 2.9, 10.0, 20.0, 30.0, 3.0, 0.0, 1.0, 2.0, 3.0]])
    out = np.asarray(perturb_image(xs, img))
    assert out.shape == (1, 4, 6, 3)
    np.testing.assert_allclose(out[0, 1, 2], [10, 20, 30])  # floored (1, 2)
    np.testing.assert_allclose(out[0, 3, 0], [1, 2, 3])
    assert out.sum() == 10 + 20 + 30 + 1 + 2 + 3


def test_perturb_image_batch_shape():
    img = jnp.zeros((4, 4, 3))
    xs = jnp.zeros((7, 5))  # 7 candidates, 1 pixel each
    out = perturb_image(xs, img)
    assert out.shape == (7, 4, 4, 3)


def _toy_predict(params, left, right):
    """Toy pair model: P(genuine) = sigmoid(mean(left) - mean(right)).

    ``params`` is the (traced) model-state slot of the attack API.
    """
    s = jnp.mean(left, axis=(1, 2, 3)) - jnp.mean(right, axis=(1, 2, 3))
    p1 = jax.nn.sigmoid(s / params)
    return jnp.stack([1.0 - p1, p1], axis=-1)


_TOY_PARAMS = jnp.float32(8.0)


def test_one_pixel_attack_moves_toward_target(rng):
    # attack_all runs a TARGETED attack toward argmax(targets): DE
    # minimises 1 - P(target) (attack.py:37-42, 63, 74-75, 96-97).
    n, h, w = 2, 8, 8
    left = jnp.full((n, h, w, 3), 100.0)
    right = jnp.full((n, h, w, 3), 100.0)
    # Target class 1 (genuine): needs mean(left) > mean(right).
    targets = jnp.tile(jnp.array([[0.0, 1.0]]), (n, 1))
    before = _toy_predict(_TOY_PARAMS, left, right)[:, 1]
    nl, nr = one_pixel_attack_pairs(
        _toy_predict, _TOY_PARAMS, left, right, targets, rng,
        pixel_count=3, maxiter=12, popsize=30,
    )
    after = _toy_predict(_TOY_PARAMS, nl, nr)[:, 1]
    assert nl.shape == left.shape and nr.shape == right.shape
    # P(target) must not decrease, and typically increases.
    assert np.all(np.asarray(after) >= np.asarray(before) - 1e-6)
    assert np.asarray(after).mean() > np.asarray(before).mean()


def test_one_pixel_attack_changes_at_most_k_pixels(rng):
    n, h, w = 1, 8, 8
    left = jnp.full((n, h, w, 3), 50.0)
    right = jnp.full((n, h, w, 3), 50.0)
    targets = jnp.array([[1.0, 0.0]])
    k = 4
    nl, nr = one_pixel_attack_pairs(
        _toy_predict, _TOY_PARAMS, left, right, targets, rng,
        pixel_count=k, maxiter=3, popsize=10,
    )
    changed = (np.abs(np.asarray(nl) - 50.0).max(axis=-1) > 1e-6).sum() + (
        np.abs(np.asarray(nr) - 50.0).max(axis=-1) > 1e-6
    ).sum()
    assert changed <= k  # k pixels across the concatenated 2HxW image


def test_proxy_attack_transfers_or_falls_back(rng):
    """Low-res surrogate: DE at proxy res, block-injected at full res,
    kept only when the full-res verification forward reproduces the
    targeted class (ops/attack.py one_pixel_attack_pairs_proxy)."""
    n, h, w = 2, 16, 16
    left = jnp.full((n, h, w, 3), 100.0)
    right = jnp.full((n, h, w, 3), 100.0)
    targets = jnp.tile(jnp.array([[0.0, 1.0]]), (n, 1))
    before = _toy_predict(_TOY_PARAMS, left, right)[:, 1]
    nl, nr = one_pixel_attack_pairs_proxy(
        _toy_predict, _TOY_PARAMS, left, right, targets, rng,
        proxy_hw=(8, 8), pixel_count=3, maxiter=12, popsize=30,
    )
    assert nl.shape == left.shape and nr.shape == right.shape
    after = _toy_predict(_TOY_PARAMS, nl, nr)[:, 1]
    changed = bool(np.any(np.asarray(nl) != 100.0)
                   or np.any(np.asarray(nr) != 100.0))
    if changed:
        # Every kept perturbation passed the full-res transfer check.
        assert np.all(np.asarray(after) >= 0.5 - 1e-6)
        assert np.asarray(after).mean() > np.asarray(before).mean()
        # Proxy pixels inject as aligned 2x2 blocks at full res.
        delta = np.abs(np.asarray(nl) - 100.0).max(-1) + np.abs(
            np.asarray(nr) - 100.0).max(-1)
        ys, xs = np.nonzero(delta.max(0) > 1e-6)
        blocks = {(y // 2, x // 2) for y, x in zip(ys, xs)}
        assert len(ys) == 4 * len(blocks)
    else:
        # No transfer: the channel fell back to the unattacked halves.
        np.testing.assert_array_equal(np.asarray(nl), 100.0)


def test_proxy_attack_rejects_non_dividing_resolution(rng):
    left = jnp.zeros((1, 10, 10, 3))
    targets = jnp.array([[0.0, 1.0]])
    with pytest.raises(ValueError, match="divide"):
        one_pixel_attack_pairs_proxy(
            _toy_predict, _TOY_PARAMS, left, left, targets, rng,
            proxy_hw=(4, 4), pixel_count=1, maxiter=1, popsize=5)


def test_fgsm_shifts_by_epsilon_sign(rng):
    n, h, w = 2, 6, 6
    left = jnp.full((n, h, w, 3), 100.0)
    right = jnp.full((n, h, w, 3), 90.0)
    targets = jnp.tile(jnp.array([[0.0, 1.0]]), (n, 1))
    nl, nr = fgsm_pairs(_toy_predict, _TOY_PARAMS, left, right, targets,
                        epsilon=2.0)
    dl = np.unique(np.round(np.asarray(nl - left), 5))
    dr = np.unique(np.round(np.asarray(nr - right), 5))
    assert set(dl.tolist()) <= {-2.0, 0.0, 2.0}
    assert set(dr.tolist()) <= {-2.0, 0.0, 2.0}
    # Targeted FGSM descends the loss (the DE channel's semantics):
    # P(target class) must RISE — the attack drives M2 toward M1's label.
    p_before = _toy_predict(_TOY_PARAMS, left, right)[:, 1]
    p_after = _toy_predict(_TOY_PARAMS, nl, nr)[:, 1]
    assert np.all(np.asarray(p_after) > np.asarray(p_before))
