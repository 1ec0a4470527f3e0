"""Mesh + sharding utilities (greenfield; SURVEY.md sections 2.4, 5.8).

Design: one logical 2-D mesh ``(data, model)``.

- ``data`` shards the leading batch axis of images / features / pair pools.
- ``model`` shards the ensemble (committee) axis and the column axis of the
  pairwise score grid.  For the reference workload's model sizes (ResNet100
  at batch <= 1024) tensor/pipeline parallelism buys nothing, so ``model``
  defaults to size 1; the axis exists so committee fan-out and the 7771^2
  evaluation grid can use the full slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    mesh_shape: tuple[int, ...] = (-1,),
    devices: list | None = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    ``mesh_shape`` is ``(data,)`` or ``(data, model)``; a ``-1`` entry is
    inferred from the device count (like a reshape).  On one chip this is a
    trivial 1x1 mesh and all shardings collapse to no-ops, which is exactly
    how the framework runs single-chip tests.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    shape = tuple(mesh_shape)
    if len(shape) == 1:
        shape = (shape[0], 1)
    if len(shape) != 2:
        raise ValueError(f"mesh_shape must have 1 or 2 dims, got {mesh_shape}")
    known = int(np.prod([s for s in shape if s != -1]))
    shape = tuple(n // known if s == -1 else s for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_grid = np.asarray(devices).reshape(shape)
    return Mesh(dev_grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding that splits the leading axis over ``data`` and replicates
    the rest — the standard layout for image/feature/pair batches."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_axis0(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad the leading axis up to a multiple of ``multiple`` — the
    one padding policy every parallel path shares (shard_batch,
    parallel.ops); change it here, not in per-site copies."""
    pad = (-x.shape[0]) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def shard_batch(mesh: Mesh, tree):
    """Place every array leaf batch-sharded on the mesh, padding the leading
    axis up to a multiple of the data-axis size if needed.

    The reference streams ragged Python lists between host and GPU per call
    (SURVEY.md section 3.1); here a batch is placed once and stays resident.
    Returns ``(sharded_tree, original_lengths_tree)`` so callers can mask
    out padding.
    """
    axis = mesh.shape[DATA_AXIS]

    def _place(x):
        x = pad_axis0(jnp.asarray(x), axis)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    def _len(x):
        # Shape read only — np.asarray on a device Array would copy the
        # whole buffer to host just to look at shape[0].
        return (x.shape[0] if hasattr(x, "shape")
                else np.asarray(x).shape[0])

    return jax.tree.map(_place, tree), jax.tree.map(_len, tree)
