"""Pipeline-parallel ArcFace inference (2-rank GPipe schedule).

Greenfield scale-out companion to ``tp.py`` (SURVEY.md section 2.4; the
reference is single-GPU).  Tensor parallelism splits every unit across
devices; pipeline parallelism instead places a contiguous *prefix* of
the network on rank 0 of the ``model`` axis and the rest on rank 1,
streaming microbatches so both ranks compute concurrently:

- tick t: rank 0 runs segment A on microbatch t while rank 1 runs
  segment B on microbatch t-1; the boundary activation hops ranks with
  ONE ``ppermute`` per tick;
- by-rank ``lax.cond`` keeps each device executing only its own
  segment; the pipeline bubble is 1/(M+1) for M microbatches;
- the split point is a unit index, so the boundary has a single static
  shape — no padded envelopes or switch tables.

Latency economics on TPU: the embedder fits on one chip, so PP here is
about *latency under a fixed batch* — two ranks each do ~half the
FLOPs per microbatch, and with M >= 2 the steady state approaches 2x.
Params are replicated (LResNet's stages are heterogeneous, so per-rank
param placement would need a different tree per device — the schedule,
not the memory, is what this module demonstrates; memory-bound models
would combine this schedule with per-stage param sharding).

Exactness vs the single-device forward is CI-tested on the virtual
mesh (``tests/test_parallel.py``) and exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alink_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
# The LResNet topology (stem / IR unit / head) lives in ONE place —
# parallel/tp.py — parameterized by an optional post-conv reduce; the
# pipeline schedule runs units whole (no reduce).
from alink_tpu.parallel.tp import _head, _ir_unit, _stem, _unit_strides


def _unit(p, x, stride, dtype):
    return _ir_unit(x, p, stride, dtype, reduce=None)


def boundary_shape(split_after_unit: int, in_hw: int = 112,
                   stage_sizes=(3, 13, 30, 3),
                   stage_widths=(64, 128, 256, 512)) -> tuple[int, int]:
    """(spatial, channels) of the activation after unit ``split_after_unit``
    (0-based; every stage entry halves the spatial dims)."""
    strides = _unit_strides(stage_sizes)
    widths = [w for blocks, w in zip(stage_sizes, stage_widths)
              for _ in range(blocks)]
    hw = in_hw
    for s in strides[: split_after_unit + 1]:
        hw //= s
    return hw, widths[split_after_unit]


def arcface_pp_apply(
    mesh: Mesh,
    params,
    images: jnp.ndarray,
    *,
    stage_sizes=(3, 13, 30, 3),
    stage_widths=(64, 128, 256, 512),
    split_after_unit: int | None = None,
    microbatches: int = 4,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Pipelined ArcFace forward: segment A on model-rank 0, B on rank 1.

    Requires a ``model`` axis of exactly 2 and a per-data-shard batch
    divisible by ``microbatches``.  ``split_after_unit`` defaults to the
    FLOP midpoint of the unit list.
    """
    if mesh.shape[MODEL_AXIS] != 2:
        raise ValueError("pipeline parallelism here uses 2 ranks — "
                         f"model axis is {mesh.shape[MODEL_AXIS]}")
    strides = _unit_strides(stage_sizes)
    n_units = len(strides)
    if split_after_unit is None:
        # FLOP midpoint: per-unit cost ~ hw^2 * c^2 at its stage.
        widths = [w for blocks, w in zip(stage_sizes, stage_widths)
                  for _ in range(blocks)]
        hw, costs = images.shape[1], []
        for s, w in zip(strides, widths):
            hw //= s
            costs.append(hw * hw * w * w)
        half, acc, split_after_unit = sum(costs) / 2, 0.0, 0
        for i, c in enumerate(costs):
            acc += c
            if acc >= half:
                split_after_unit = i
                break
    if not 0 <= split_after_unit < n_units - 1:
        raise ValueError("split point must leave units on both ranks")

    n = images.shape[0]
    nd = mesh.shape[DATA_AXIS]
    if n % (nd * microbatches):
        raise ValueError(
            f"batch {n} must divide data axis {nd} x microbatches "
            f"{microbatches}")
    mb = n // nd // microbatches
    bhw, bc = boundary_shape(split_after_unit, images.shape[1],
                             stage_sizes, stage_widths)
    p = params["params"] if "params" in params else params
    embed_dim = p["fc1_gamma"].shape[0]

    def seg_a(pp, x):
        x = _stem(pp, x, dtype)
        for i in range(split_after_unit + 1):
            x = _unit(pp[f"_IRUnit_{i}"], x, strides[i], dtype)
        return x.astype(jnp.float32)

    def seg_b(pp, x):
        x = x.astype(dtype)
        for i in range(split_after_unit + 1, n_units):
            x = _unit(pp[f"_IRUnit_{i}"], x, strides[i], dtype)
        return _head(pp, x, dtype)

    def fwd(pp, imgs):
        # imgs: (n/nd, H, W, 3) — this device's data shard.
        rank = lax.axis_index(MODEL_AXIS)
        mbs = imgs.reshape((microbatches, mb) + imgs.shape[1:])
        # One extra drain tick: A idles (recomputes mb 0, discarded),
        # B finishes the last microbatch.
        stream = jnp.concatenate([mbs, mbs[:1]], axis=0)
        boundary0 = jnp.zeros((mb, bhw, bhw, bc), jnp.float32)

        def tick(carry, x_mb):
            boundary = carry
            out = lax.cond(
                rank == 0,
                lambda: (seg_a(pp, x_mb),
                         jnp.zeros((mb, embed_dim), jnp.float32)),
                lambda: (jnp.zeros((mb, bhw, bhw, bc), jnp.float32),
                         seg_b(pp, boundary)),
            )
            nxt = lax.ppermute(out[0], MODEL_AXIS, perm=[(0, 1)])
            return nxt, out[1]

        _, embs = lax.scan(tick, boundary0, stream)
        # Ticks 1..M carry microbatches 0..M-1 (rank 1's lane); rank 0
        # contributed zeros — a psum over the 2 ranks recovers the real
        # values on every device.
        embs = lax.psum(embs[1:], MODEL_AXIS)
        return embs.reshape(n // nd, embed_dim)

    images = jax.device_put(
        images, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
    out = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None, None, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )(p, images)
    return out.reshape(n, embed_dim)
