"""Orbax-backed checkpointing.

Reference: ``code/siamese.py:114-125`` — ``maybeLoadFromMemory`` (bare
try/except around ``load_weights``) and ``save`` write per-model ``.h5``
weight files; the A-LINK loop itself has **no** mid-run checkpointing, so an
interrupted run loses all selection state (SURVEY.md section 5.4).

Here any pytree (model params, a full TrainState, or the A-LINK loop state
bundle) checkpoints atomically through orbax, with the same
"return False instead of raising" restore contract the drivers rely on
(``ALINK.py:99-114`` train-or-load staging).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _path(path: str) -> str:
    return os.path.abspath(path)


def save(path: str, tree: Any) -> None:
    """Atomically save an arbitrary pytree of arrays to ``path``."""
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(_path(path), tree, force=True)


def restore(path: str, like: Any | None = None) -> Any:
    """Restore a pytree; ``like`` provides structure/dtype/sharding targets."""
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(_path(path))
        return ckptr.restore(
            _path(path),
            args=ocp.args.PyTreeRestore(
                item=jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
                if _all_arrays(like) else like
            ),
        )


def maybe_restore(path: str, like: Any | None = None) -> tuple[Any, bool]:
    """``maybeLoadFromMemory`` semantics (siamese.py:114-119): restore if a
    checkpoint exists, else ``(like, False)`` — never raises on absence."""
    try:
        if not os.path.isdir(_path(path)):
            return like, False
        return restore(path, like), True
    except Exception:
        return like, False


def _all_arrays(tree: Any) -> bool:
    leaves = jax.tree.leaves(tree)
    return bool(leaves) and all(
        hasattr(leaf, "shape") and hasattr(leaf, "dtype") for leaf in leaves
    )
