"""Mesh-sharded wrappers for the framework's bulk device passes.

Greenfield (SURVEY.md sections 2.4, 5.8): the reference runs everything in
one GPU context.  These wrappers shard the three bulk workloads over the
``(data, model)`` mesh:

- ``sharded_featurize``      — embedding extraction, batch DP-sharded over
  ``data`` (the gradient-free analogue of data parallelism; each device
  embeds its shard, no collectives);
- ``sharded_committee_probs``— committee members sharded over ``model``,
  batch over ``data``; the ensemble mean is one ``psum``-backed mean XLA
  inserts from the output sharding;
- the pairwise score grid is already covered by
  ``ops.pairwise.score_matrix_sharded`` (2-D row x column decomposition).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alink_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, pad_axis0


def _pad_batch(x: jnp.ndarray, multiple: int) -> tuple[jnp.ndarray, int]:
    return pad_axis0(x, multiple), x.shape[0]


def sharded_featurize(
    mesh: Mesh,
    featurize: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
) -> jnp.ndarray:
    """Run a featurizer with the batch sharded across the whole mesh.

    Both mesh axes shard the batch (a featurizer has no model axis), so
    all devices contribute; the result keeps the original length.
    """
    total = mesh.devices.size
    images, n = _pad_batch(jnp.asarray(images), total)
    images = jax.device_put(
        images, NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS))))
    fn = shard_map(
        featurize, mesh=mesh,
        in_specs=P((DATA_AXIS, MODEL_AXIS)),
        out_specs=P((DATA_AXIS, MODEL_AXIS)),
        check_vma=False,
    )
    return fn(images)[:n]


def sharded_face_pipeline(mesh: Mesh, face_model, images) -> jnp.ndarray:
    """Detect->align->embed with the image batch sharded over the mesh.

    The production serving fan-out: ``FaceModel.pipeline`` (one fused
    program per shard — cascade, alignment warp, embedder) runs data-
    parallel across every device; no collectives are needed because the
    pipeline is per-image.  Greenfield vs the reference's batch=1 single
    GPU context (face_model.py:39, SURVEY.md section 2.4).
    """
    return sharded_featurize(
        mesh,
        lambda im: face_model.pipeline(face_model.embed_params,
                                       face_model.cascade_params, im),
        images,
    )


def sharded_committee_probs(
    mesh: Mesh,
    head,
    stacked_params,
    left: jnp.ndarray,
    right: jnp.ndarray,
) -> jnp.ndarray:
    """Committee mean probabilities with members sharded over ``model``.

    Requires num_members % mesh.model == 0.  Each model-axis shard vmaps
    its members and the cross-shard mean is a ``psum`` over ``model`` —
    the committee-parallel layout SURVEY.md section 2.4 prescribes.
    """
    nm = mesh.shape[MODEL_AXIS]
    nd = mesh.shape[DATA_AXIS]
    e = jax.tree.leaves(stacked_params)[0].shape[0]
    if e % nm != 0:
        raise ValueError(f"{e} members not divisible over model axis {nm}")
    left, n = _pad_batch(jnp.asarray(left), nd)
    right, _ = _pad_batch(jnp.asarray(right), nd)

    def shard_fn(params, le, r):
        probs = jax.vmap(lambda p: head.apply(p, le, r))(params)
        local = jnp.sum(probs, axis=0)
        return jax.lax.psum(local, MODEL_AXIS) / e

    params = jax.device_put(
        stacked_params,
        NamedSharding(mesh, P(MODEL_AXIS)))
    left = jax.device_put(left, NamedSharding(mesh, P(DATA_AXIS)))
    right = jax.device_put(right, NamedSharding(mesh, P(DATA_AXIS)))
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
    return fn(params, left, right)[:n]
