"""Noise-bank statistics / semantics tests (reference: code/noise.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.ops import noise


def _imgs(key, n=4, size=32):
    return jax.random.uniform(key, (n, size, size, 3)) * 255.0


def test_gaussian_statistics(rng):
    # noise.py:33-45 — additive N(10, sqrt(10)^2).
    x = jnp.zeros((2, 64, 64, 3))
    y = noise.gaussian(rng, x)
    delta = np.asarray(y - x)
    assert abs(delta.mean() - 10.0) < 0.1
    assert abs(delta.std() - np.sqrt(10.0)) < 0.1


def test_salt_pepper_counts(rng):
    # noise.py:48-65 — ceil(.004*size*.5) salt (=1), same pepper (=0).
    size = 64 * 64 * 3
    x = jnp.full((3, 64, 64, 3), 100.0)
    y = np.asarray(noise.salt_pepper(rng, x))
    n_salt = (y == 1.0).sum(axis=(1, 2, 3))
    n_pepper = (y == 0.0).sum(axis=(1, 2, 3))
    expected = np.ceil(0.004 * size * 0.5)
    # Drawn with replacement -> counts can only fall short of the target.
    assert np.all(n_salt <= expected) and np.all(n_salt > 0.8 * expected)
    assert np.all(n_pepper <= expected) and np.all(n_pepper > 0.8 * expected)
    # Everything else untouched.
    assert ((y == 100.0).sum() + n_salt.sum() + n_pepper.sum()) == y.size


def test_poisson_scaling(rng):
    # noise.py:68-76 — Poisson(x*vals)/vals preserves the mean.
    x = jnp.full((2, 32, 32, 3), 50.0) + jax.random.uniform(rng, (2, 32, 32, 3))
    y = np.asarray(noise.poisson(rng, x))
    assert y.shape == x.shape
    np.testing.assert_allclose(y.mean(), 50.5, atol=1.0)
    assert y.min() >= 0


@pytest.mark.slow
def test_poisson_approx_matches_exact_statistics(rng):
    """The default Gaussian-limit sampler must match the exact Poisson's
    mean AND variance, and the uint8 unique-count must agree with the
    sort-based one (both feed vals = 2**ceil(log2(n_unique)))."""
    img = jnp.round(jax.random.uniform(rng, (1, 16, 16, 3)) * 200.0)
    batch = jnp.tile(img, (64, 1, 1, 1))
    k1, k2 = jax.random.split(rng)
    approx = np.asarray(noise.poisson(k1, batch))
    exact = np.asarray(noise.poisson(k2, batch, exact=True))
    np.testing.assert_allclose(approx.mean(), exact.mean(), rtol=0.02)
    np.testing.assert_allclose(approx.std(), exact.std(), rtol=0.05)
    # Same vals on integer images: sort path == histogram path.
    a = np.asarray(noise.poisson(k1, batch))
    b = np.asarray(noise.poisson(k1, batch, assume_uint8=False))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_speckle_statistics(rng):
    # noise.py:79-88 — x + x*N(0, 1/15): std of relative error ~= 1/15.
    x = jnp.full((2, 64, 64, 3), 200.0)
    y = np.asarray(noise.speckle(rng, x))
    rel = (y - 200.0) / 200.0
    assert abs(rel.std() - 1.0 / 15.0) < 0.005
    assert abs(rel.mean()) < 0.005


def test_perlin_octave_matches_direct_formula(rng):
    """Check the vectorised octave against the per-pixel definition
    (noise.py:95-140 semantics re-derived in SURVEY/docstring)."""
    size, ns = 12, 4
    field = np.asarray(noise._perlin_octave(rng, size, ns))
    # Recompute gradients identically.
    nc = size // ns
    phi = np.asarray(
        jax.random.uniform(rng, (nc + 1, nc + 1), minval=0.0, maxval=2 * np.pi)
    )
    g = np.stack([np.cos(phi), np.sin(phi)], axis=-1)

    def fade(t):
        return t**3 * (t * (t * 6 - 15) + 10)

    for (r, c) in [(0, 0), (3, 7), (5, 5), (11, 11), (4, 0)]:
        i, j, u, v = r // ns, c // ns, r % ns, c % ns
        d00 = v * g[i, j, 0] + u * g[i, j, 1]
        d01 = (v - ns) * g[i, j + 1, 0] + u * g[i, j + 1, 1]
        d10 = v * g[i + 1, j, 0] + (u - ns) * g[i + 1, j, 1]
        d11 = (v - ns) * g[i + 1, j + 1, 0] + (u - ns) * g[i + 1, j + 1, 1]
        fu, fv = fade(u / ns), fade(v / ns)
        top = d00 + fv * (d01 - d00)
        bot = d10 + fv * (d11 - d10)
        expected = top + fu * (bot - top)
        np.testing.assert_allclose(field[r, c], expected, rtol=1e-5)


def test_perlin_zero_at_grid_nodes(rng):
    # At patch corners the offset (0, 0) dot any gradient is 0.
    field = np.asarray(noise._perlin_octave(rng, 16, 4))
    for r in range(0, 16, 4):
        for c in range(0, 16, 4):
            np.testing.assert_allclose(field[r, c], 0.0, atol=1e-5)


@pytest.mark.slow
def test_perlin_octave_selection(rng):
    # noise.py:145-148 — 112 % 56 == 0 -> (56, 32, 16) octaves; sizes not
    # divisible by 56 use (50, 30, 15).  Both must run without error.
    x112 = jnp.zeros((1, 112, 112, 3))
    y = noise.perlin(rng, x112)
    assert y.shape == x112.shape
    x100 = jnp.zeros((1, 100, 100, 3))
    y = noise.perlin(rng, x100)
    assert y.shape == x100.shape
    # Same field added to all 3 channels (noise.py:149).
    d = np.asarray(y)
    np.testing.assert_allclose(d[..., 0], d[..., 1], rtol=1e-6)


def test_perlin_rejects_non_square(rng):
    with pytest.raises(ValueError):
        noise.perlin(rng, jnp.zeros((1, 32, 64, 3)))


def test_registry_parity():
    # noise.py:191-205.
    for name in ["gaussian", "saltpepper", "poisson", "speckle", "perlin", "plain"]:
        assert callable(noise.get_relevant_noise(name))
    assert noise.get_relevant_noise("GAUSSIAN") is noise.gaussian
    with pytest.raises(NotImplementedError):
        noise.get_relevant_noise("nope")


def test_apply_noise_bank_shapes(rng):
    left = _imgs(rng, n=3, size=16)
    right = _imgs(jax.random.PRNGKey(1), n=3, size=16)
    l, r = noise.apply_noise_bank(("gaussian", "speckle", "plain"), rng, left, right)
    assert l.shape == (3, 3, 16, 16, 3)
    assert r.shape == (3, 3, 16, 16, 3)
    # plain channel is untouched.
    np.testing.assert_allclose(np.asarray(l[2]), np.asarray(left))


def test_plain_identity(rng):
    x = _imgs(rng, 2, 8)
    np.testing.assert_array_equal(np.asarray(noise.plain(rng, x)), np.asarray(x))
