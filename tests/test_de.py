"""Differential-evolution tests.

Golden values come from analytic optima — the reference fork's own docstring
examples (differential_evolution.py:176-196: Rosenbrock -> [1, 1], Ackley ->
[0, 0]) are the test vectors, per SURVEY.md section 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.ops.de import _lhs_init, differential_evolution


def _sphere(x):
    return jnp.sum(x**2, axis=-1)


def _rosen(x):
    return jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1 - x[..., :-1]) ** 2,
        axis=-1,
    )


def _ackley(x):
    a = x[..., 0]
    b = x[..., 1]
    arg1 = -0.2 * jnp.sqrt(0.5 * (a**2 + b**2))
    arg2 = 0.5 * (jnp.cos(2 * jnp.pi * a) + jnp.cos(2 * jnp.pi * b))
    return -20.0 * jnp.exp(arg1) - jnp.exp(arg2) + 20.0 + jnp.e


def test_lhs_is_stratified(rng):
    m, k = 32, 3
    pop = np.asarray(_lhs_init(rng, m, k))
    # Each column must contain exactly one sample per 1/m stratum
    # (de.py:433-462).
    for j in range(k):
        strata = np.floor(pop[:, j] * m).astype(int)
        assert sorted(strata.tolist()) == list(range(m))


def test_sphere_converges(rng):
    bounds = jnp.array([[-5.0, 5.0]] * 3)
    res = differential_evolution(_sphere, bounds, rng, maxiter=100)
    assert float(res.fun) < 1e-3
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=0.1)


def test_rosenbrock_docstring_example(rng):
    # differential_evolution.py:179-184 — bounds [(0,2),(0,2)] -> x = [1, 1].
    bounds = jnp.array([[0.0, 2.0], [0.0, 2.0]])
    res = differential_evolution(_rosen, bounds, rng, maxiter=300, tol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=0.02)


def test_ackley_docstring_example(rng):
    # differential_evolution.py:188-196 — bounds [(-5,5),(-5,5)] -> x = [0, 0].
    bounds = jnp.array([[-5.0, 5.0], [-5.0, 5.0]])
    res = differential_evolution(_ackley, bounds, rng, maxiter=300, tol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), [0.0, 0.0], atol=0.02)


@pytest.mark.parametrize(
    "strategy",
    ["best1bin", "rand1bin", "randtobest1bin", "currenttobest1bin",
     "best2bin", "rand2bin", "best1exp", "rand1exp"],
)
def test_all_strategies_reduce_energy(rng, strategy):
    bounds = jnp.array([[-3.0, 3.0]] * 2)
    res = differential_evolution(
        _sphere, bounds, rng, strategy=strategy, maxiter=60, tol=0.0
    )
    assert float(res.fun) < 0.5


def test_invalid_strategy_raises(rng):
    with pytest.raises(ValueError):
        differential_evolution(
            _sphere, jnp.array([[0.0, 1.0]]), rng, strategy="nope"
        )


def test_best_slot_holds_minimum(rng):
    bounds = jnp.array([[-5.0, 5.0]] * 2)
    res = differential_evolution(_sphere, bounds, rng, maxiter=20, tol=0.0)
    energies = np.asarray(res.energies)
    assert energies[0] == energies.min()
    np.testing.assert_allclose(float(_sphere(res.x)), float(res.fun), rtol=1e-5)


def test_early_stop_fires(rng):
    bounds = jnp.array([[-5.0, 5.0]] * 2)
    res = differential_evolution(
        _sphere, bounds, rng, maxiter=500, tol=0.0,
        early_stop_fn=lambda x: _sphere(x) < 1.0,
    )
    assert bool(res.stopped_early)
    assert int(res.nit) < 500
    assert float(res.fun) < 1.0


def test_atol_negative_never_converges_early(rng):
    # attack.py:83 uses atol=-1 so std(E) <= -1 + .01|mean| never triggers
    # for probabilities; the solve must run to maxiter (or early stop).
    bounds = jnp.array([[0.0, 1.0]] * 2)
    res = differential_evolution(
        lambda x: jnp.clip(_sphere(x), 0, 1), bounds, rng, maxiter=7, atol=-1.0
    )
    assert int(res.nit) == 7


def test_population_respects_bounds(rng):
    bounds = jnp.array([[2.0, 4.0], [-1.0, 0.0]])
    res = differential_evolution(_sphere, bounds, rng, maxiter=15, tol=0.0)
    pop = np.asarray(res.population)
    assert pop[:, 0].min() >= 2.0 and pop[:, 0].max() <= 4.0
    assert pop[:, 1].min() >= -1.0 and pop[:, 1].max() <= 0.0


def test_vmap_over_problems(rng):
    # The attack path vmaps the solver over a batch of images
    # (replacing attack.py:94-101's serial loop).
    bounds = jnp.array([[-4.0, 4.0]] * 2)
    offsets = jnp.array([[0.0, 0.0], [1.0, 1.0], [-2.0, 0.5]])

    def solve(off, k):
        return differential_evolution(
            lambda x: jnp.sum((x - off) ** 2, axis=-1), bounds, k,
            maxiter=80, tol=0.0,
        ).x

    xs = jax.vmap(solve)(offsets, jax.random.split(rng, 3))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(offsets), atol=0.15)


def test_min_population_with_single_param(rng):
    """m = max(5, popsize*K) can be exactly 5 (one parameter): the shared
    5-sample draw must wrap, not crash (reference sizes its draw per
    strategy, de.py:879-888)."""
    from alink_tpu.ops.de import differential_evolution

    res = differential_evolution(
        lambda x: jnp.sum(x ** 2, axis=-1), jnp.array([[-3.0, 3.0]]),
        rng, popsize=5, maxiter=60, strategy="best1bin")
    # 5 members is the degenerate minimum — assert progress, not optima.
    assert float(res.fun) < 0.1


def test_explicit_mutation_and_recombination_trace(rng):
    """mutation (a dither tuple) and recombination drive Python-level
    control flow, so they are static jit args — passing them explicitly
    must trace, including the exponential branch."""
    from alink_tpu.ops.de import differential_evolution

    bounds = jnp.array([[-2.0, 2.0]] * 3)
    f = lambda x: jnp.sum(x ** 2, axis=-1)  # noqa: E731
    res = differential_evolution(f, bounds, rng, mutation=(0.3, 0.9),
                                 recombination=0.9, maxiter=40)
    assert float(res.fun) < 1e-2
    res = differential_evolution(f, bounds, rng, strategy="best1exp",
                                 mutation=0.7, recombination=0.85,
                                 maxiter=60)
    assert float(res.fun) < 1e-1
