"""Opt-in numeric sanitizers (SURVEY.md section 5.2).

The reference has no NaN/Inf detection anywhere — a diverged finetune or
a degenerate noise channel silently poisons every later selection round.
Here the loop's training/selection outputs can be guarded by an opt-in
check (``ALinkConfig.debug_nans`` or ``enable_nan_guard()``): one tiny
jitted all-finite reduction per guarded phase, a single scalar fetch,
and a host-side ``FloatingPointError`` naming the phase that produced
the first non-finite value.

Off by default: the check costs a device round trip per phase (tens of
ms through a remote tunnel), which is why it is a debug mode and not an
always-on assert.  Unlike ``jax.config.jax_debug_nans`` it neither
disables fusion nor re-runs programs op-by-op — compiled programs are
untouched; only their outputs are inspected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = False


def enable_nan_guard(on: bool = True) -> None:
    """Globally switch the guard (process-wide; also settable per-loop
    via ``ALinkConfig.debug_nans``)."""
    global _ENABLED
    _ENABLED = bool(on)


def nan_guard_enabled() -> bool:
    return _ENABLED


@jax.jit
def _all_finite(leaves: tuple) -> jnp.ndarray:
    flags = [jnp.all(jnp.isfinite(x)) for x in leaves]
    return jnp.all(jnp.stack(flags)) if flags else jnp.array(True)


def check_finite(tree, phase: str, *, force: bool = False) -> None:
    """Raise ``FloatingPointError`` if any inexact leaf of ``tree``
    contains a NaN/Inf.  No-op unless the guard is enabled (or
    ``force=True``).  One jitted reduction + one scalar fetch."""
    if not (_ENABLED or force):
        return
    leaves = tuple(
        x for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
    )
    if not leaves:
        return
    if not bool(_all_finite(leaves)):
        # Second (host) pass only on failure: name the offending leaves.
        bad = [
            f"leaf[{i}] shape={tuple(x.shape)} dtype={x.dtype}"
            for i, x in enumerate(leaves)
            if not bool(jnp.all(jnp.isfinite(x)))
        ]
        raise FloatingPointError(
            f"nan-guard: non-finite values in phase '{phase}': "
            + "; ".join(bad)
        )
