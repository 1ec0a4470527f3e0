"""Pure-JAX differential evolution with population-batched fitness.

Reference: code/differential_evolution.py — a forked SciPy DE whose single
"vectorized inner engine" change is that ``func`` receives the whole
``(pop, params)`` matrix so a neural net can batch its predictions
(de.py:630-668, 673-748).  This rebuild keeps those semantics and makes the
whole solve a single on-device ``lax.while_loop``:

- population lives in [0, 1]^K and is scaled by ``mid + (x - 0.5) * width``
  (de.py:763-773);
- ``num_population_members = max(5, popsize * K)`` (de.py:415);
- Latin-hypercube init: stratified uniform samples, independently permuted
  per parameter column (de.py:433-469);
- per-generation: dithered mutation scale (de.py:688-690), one of the six
  classic mutation strategies (de.py:820-877), binomial or exponential
  crossover with a guaranteed fill point (de.py:798-818), out-of-bounds
  resampling (de.py:775-780), batched energy evaluation, element-wise greedy
  replacement plus best-slot update (de.py:703-714);
- convergence test ``std(E) <= atol + tol * |mean(E)|`` (de.py:592-594) and
  an optional per-generation early-stop callback on the incumbent best
  (de.py:583-590; the one-pixel attack uses it as attack_success).

The solver is a pure function of its PRNG key and is ``vmap``-able over a
batch of problems — that is how ``ops.attack`` attacks a whole pair batch
concurrently instead of the reference's serial per-image loop
(attack.py:94-101).

polish/L-BFGS-B is intentionally absent: the only reference call site
disables it (attack.py:83, ``polish=False``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_BINOMIAL = {"best1bin", "randtobest1bin", "currenttobest1bin",
             "best2bin", "rand2bin", "rand1bin"}
_EXPONENTIAL = {"best1exp", "rand1exp", "randtobest1exp",
                "currenttobest1exp", "best2exp", "rand2exp"}


class DEResult(NamedTuple):
    x: jnp.ndarray          # best parameters, scaled to bounds
    fun: jnp.ndarray        # best energy
    nit: jnp.ndarray        # generations executed
    nfev: jnp.ndarray       # fitness evaluations
    population: jnp.ndarray  # final population, scaled
    energies: jnp.ndarray
    stopped_early: jnp.ndarray  # True if early_stop_fn fired


def _lhs_init(key: jax.Array, m: int, k: int) -> jnp.ndarray:
    """Latin hypercube sampling (de.py:433-469)."""
    ku, kp = jax.random.split(key)
    segsize = 1.0 / m
    samples = segsize * jax.random.uniform(ku, (m, k)) + jnp.linspace(
        0.0, 1.0, m, endpoint=False
    )[:, None]
    perm_keys = jax.random.split(kp, k)
    cols = jax.vmap(lambda pk, col: col[jax.random.permutation(pk, m)],
                    in_axes=(0, 1), out_axes=1)(perm_keys, samples)
    return cols


def _mutate(
    strategy: str,
    pop: jnp.ndarray,
    idxs: jnp.ndarray,
    candidates: jnp.ndarray,
    scale: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorised mutation strategies (de.py:820-877).

    ``idxs``: (M, 5) distinct random member indices excluding the candidate.
    """
    base = strategy.replace("bin", "").replace("exp", "")
    p = lambda i: pop[idxs[:, i]]  # noqa: E731
    best = pop[0]
    if base == "best1":
        return best + scale * (p(0) - p(1))
    if base == "rand1":
        return p(0) + scale * (p(1) - p(2))
    if base == "randtobest1":
        bprime = p(0)
        bprime = bprime + scale * (best - bprime)
        return bprime + scale * (p(1) - p(2))
    if base == "currenttobest1":
        cur = pop[candidates]
        return cur + scale * (best - cur + p(0) - p(1))
    if base == "best2":
        return best + scale * (p(0) + p(1) - p(2) - p(3))
    if base == "rand2":
        return p(0) + scale * (p(1) + p(2) - p(3) - p(4))
    raise ValueError(f"unknown strategy {strategy}")


@partial(
    jax.jit,
    static_argnames=(
        "fitness_fn", "strategy", "maxiter", "popsize", "init", "early_stop_fn",
        # mutation/recombination drive Python-level control flow (dither
        # detection, the exponential-length branch), so they must be
        # concrete at trace time — as tracers they'd raise on `sorted`/`>=`.
        "mutation", "recombination",
    ),
)
def differential_evolution(
    fitness_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bounds: jnp.ndarray,
    key: jax.Array,
    *,
    strategy: str = "best1bin",
    maxiter: int = 1000,
    popsize: int = 15,
    tol: float = 0.01,
    mutation=(0.5, 1.0),
    recombination: float = 0.7,
    init: str = "latinhypercube",
    atol: float = 0.0,
    early_stop_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> DEResult:
    """Minimise ``fitness_fn`` over box bounds with reference DE semantics.

    Args:
        fitness_fn: batched energies, ``(M, K) scaled params -> (M,)``.
        bounds: (K, 2) array of (low, high) per parameter.
        key: PRNG key; the solve is a pure function of it.
        early_stop_fn: optional ``(K,) scaled best -> bool``; checked after
            each generation like the reference callback (de.py:583-590).

    Returns a ``DEResult``; all fields are device values.
    """
    if strategy not in _BINOMIAL | _EXPONENTIAL:
        raise ValueError("Please select a valid mutation strategy")
    bounds = jnp.asarray(bounds, jnp.float32)
    k = bounds.shape[0]
    m = max(5, popsize * k)
    mid = 0.5 * (bounds[:, 0] + bounds[:, 1])  # de.py:404
    width = jnp.abs(bounds[:, 0] - bounds[:, 1])  # de.py:405

    def scale_params(x):
        return mid + (x - 0.5) * width  # de.py:763-767

    dither = mutation if hasattr(mutation, "__len__") and len(mutation) > 1 else None

    kinit, kloop = jax.random.split(key)
    if init == "latinhypercube":
        pop0 = _lhs_init(kinit, m, k)
    elif init == "random":
        pop0 = jax.random.uniform(kinit, (m, k))
    else:
        raise ValueError("init must be 'latinhypercube' or 'random'")

    e0 = fitness_fn(scale_params(pop0))
    # Swap best into slot 0 (de.py:661-668).
    ib = jnp.argmin(e0)
    pop0 = pop0.at[0].set(pop0[ib]).at[ib].set(pop0[0])
    e0 = e0.at[0].set(e0[ib]).at[ib].set(e0[0])

    cand = jnp.arange(m)

    # Every strategy shares one 5-sample draw; with the minimum
    # population (m=5: only 4 other members) the tail samples wrap onto
    # the first ones — the reference sizes its draw per strategy
    # (de.py:879-888), so 2-sample strategies work at m=5 there and
    # keep working here, while 5-sample strategies are degenerate at
    # that size in both implementations.
    n_drawn = min(5, m - 1)

    def sample_idx(kk, c):
        """5 distinct member indices excluding the candidate (de.py:879-888)."""
        r = jax.random.choice(kk, m - 1, (n_drawn,), replace=False)
        if n_drawn < 5:
            r = jnp.concatenate([r, r[: 5 - n_drawn]])
        return jnp.where(r >= c, r + 1, r)

    def generation(pop, energies, gkey):
        kd, ks, kf, kr, ke = jax.random.split(gkey, 5)
        if dither is not None:
            lo, hi = sorted(dither)
            scale = jax.random.uniform(kd) * (hi - lo) + lo
        else:
            scale = jnp.asarray(mutation, jnp.float32)
        idxs = jax.vmap(sample_idx)(jax.random.split(ks, m), cand)
        bprime = _mutate(strategy, pop, idxs, cand, scale)
        fill = jax.random.randint(kf, (m,), 0, k)
        if strategy in _BINOMIAL:
            cross = jax.random.uniform(kr, (m, k)) < recombination
            cross = cross.at[cand, fill].set(True)  # de.py:805
        else:
            # Exponential: contiguous run from fill of geometric length L,
            # P(L >= i) = CR^i (de.py:809-818).  NOTE: the fork's while
            # loop can copy ZERO parameters (P(L=0) = 1-CR) — modern
            # scipy guarantees the fill point instead; we preserve the
            # fork's semantics.
            u = jax.random.uniform(kr, (m,), minval=1e-12)
            if recombination >= 1.0:
                length = jnp.full((m,), k)
            else:
                length = jnp.floor(
                    jnp.log(u) / jnp.log(jnp.float32(max(recombination, 1e-12)))
                ).astype(jnp.int32)
            offs = (jnp.arange(k)[None, :] - fill[:, None]) % k
            cross = offs < jnp.minimum(length, k)[:, None]
        trial = jnp.where(cross, bprime, pop)
        # Constraint resampling (de.py:775-780).
        rnd = jax.random.uniform(ke, (m, k))
        trial = jnp.where((trial < 0) | (trial > 1), rnd, trial)
        e_trial = fitness_fn(scale_params(trial))
        improved = e_trial < energies
        pop = jnp.where(improved[:, None], trial, pop)
        energies = jnp.where(improved, e_trial, energies)
        # Best-slot copy (de.py:712-714): the best member is duplicated into
        # slot 0; ties keep the incumbent.
        ibest = jnp.argmin(energies)
        better = energies[ibest] < energies[0]
        pop = pop.at[0].set(jnp.where(better, pop[ibest], pop[0]))
        energies = energies.at[0].set(jnp.where(better, energies[ibest], energies[0]))
        return pop, energies

    def converged(energies):
        return jnp.std(energies) <= atol + tol * jnp.abs(jnp.mean(energies))

    def cond(state):
        pop, energies, _, nit, stop = state
        return (nit < maxiter) & ~stop & ~converged(energies)

    def body(state):
        pop, energies, lkey, nit, stop = state
        lkey, gkey = jax.random.split(lkey)
        pop, energies = generation(pop, energies, gkey)
        if early_stop_fn is not None:
            stop = stop | early_stop_fn(scale_params(pop[0]))
        return pop, energies, lkey, nit + 1, stop

    pop, energies, _, nit, stopped = jax.lax.while_loop(
        cond, body, (pop0, e0, kloop, jnp.int32(0), jnp.array(False))
    )
    return DEResult(
        x=scale_params(pop[0]),
        fun=energies[0],
        nit=nit,
        # init population + one population per generation, plus the one
        # early-stop probe per generation when early_stop_fn is set
        # (attack.py's per-generation success forward) — otherwise the
        # count systematically under-reports model-forward budget.
        nfev=(nit + 1) * m + (nit if early_stop_fn is not None else 0),
        population=scale_params(pop),
        energies=energies,
        stopped_early=stopped,
    )
