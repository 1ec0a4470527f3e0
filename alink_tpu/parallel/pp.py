"""Pipeline-parallel ArcFace inference (R-rank GPipe schedule).

Greenfield scale-out companion to ``tp.py`` (SURVEY.md section 2.4; the
reference is single-GPU).  Tensor parallelism splits every unit across
devices; pipeline parallelism instead places a contiguous *segment* of
the network on each rank of the ``model`` axis and streams microbatches
so all ranks compute concurrently:

- tick t: rank r runs its segment on the microbatch that entered the
  pipe at tick t - r; every boundary activation hops to the next rank
  with ONE ``ppermute`` per tick;
- segment boundary shapes differ per rank, so activations travel in a
  common zero-padded f32 *envelope* (flattened to the largest boundary)
  — one static shape for the collective, unpacked per rank with static
  slice/reshape inside that rank's ``lax.switch`` branch;
- the pipeline bubble is (R-1)/(M+R-1) for M microbatches.

Latency economics on TPU: the embedder fits on one chip, so PP here is
about *latency under a fixed batch* — R ranks each do ~1/R of the
FLOPs per microbatch, approaching Rx in steady state.  Params are
replicated (LResNet's stages are heterogeneous, so per-rank param
placement would need a different tree per device — the schedule, not
the memory, is what this module demonstrates; memory-bound models would
combine this schedule with per-stage param sharding).

Exactness vs the single-device forward is CI-tested on the virtual mesh
at 2 and 4 ranks (``tests/test_parallel.py``) and exercised by
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


def _default_splits(n_ranks: int, strides, widths, in_hw: int
                    ) -> tuple[int, ...]:
    """R-1 FLOP-balanced split points (unit index each segment ends at).

    Per-unit cost ~ hw^2 * c^2 at its stage; split k closes when the
    prefix cost first reaches k/R of the total, while always leaving at
    least one unit per remaining rank.
    """
    hw, costs = in_hw, []
    for s, w in zip(strides, widths):
        hw //= s
        costs.append(float(hw * hw * w * w))
    total = sum(costs)
    n_units = len(costs)
    splits, acc, i = [], 0.0, 0
    for k in range(1, n_ranks):
        target = total * k / n_ranks
        while acc < target and i < n_units - (n_ranks - k):
            acc += costs[i]
            i += 1
        splits.append(i - 1)
    return tuple(splits)


def arcface_pp_apply(
    mesh: Mesh,
    params,
    images: jnp.ndarray,
    *,
    stage_sizes=(3, 13, 30, 3),
    stage_widths=(64, 128, 256, 512),
    split_after_unit: int | None = None,
    splits: tuple[int, ...] | None = None,
    microbatches: int = 4,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Pipelined ArcFace forward over the ``model`` axis (R >= 2 ranks).

    Segment r (a contiguous run of IR units; the stem rides with segment
    0, the head with segment R-1) runs on model-rank r.  ``splits`` is
    the R-1 ascending unit indices each segment ends after; defaults to
    the FLOP balance of ``_default_splits``.  ``split_after_unit`` is
    the legacy 2-rank spelling of the same thing (one split point).
    Requires a per-data-shard batch divisible by ``microbatches``.
    """
    n_ranks = mesh.shape[MODEL_AXIS]
    if n_ranks < 2:
        raise ValueError("pipeline parallelism needs a model axis of >= 2 "
                         f"ranks — got {n_ranks}")
    strides = _unit_strides(stage_sizes)
    n_units = len(strides)
    if n_units < n_ranks:
        raise ValueError(f"{n_units} units cannot fill {n_ranks} ranks")
    widths = [w for blocks, w in zip(stage_sizes, stage_widths)
              for _ in range(blocks)]
    if splits is None and split_after_unit is not None:
        if n_ranks != 2:
            raise ValueError("split_after_unit is the 2-rank spelling; "
                             f"pass splits= for {n_ranks} ranks")
        splits = (split_after_unit,)
    if splits is None:
        splits = _default_splits(n_ranks, strides, widths, images.shape[1])
    if len(splits) != n_ranks - 1 or sorted(set(splits)) != list(splits) \
            or not all(0 <= s < n_units - 1 for s in splits) \
            or any(b - a < 1 for a, b in zip(splits, splits[1:])):
        raise ValueError(
            f"splits {splits} must be {n_ranks - 1} ascending unit indices "
            f"leaving at least one unit on both ranks of every boundary "
            f"(units: {n_units})")

    n = images.shape[0]
    nd = mesh.shape[DATA_AXIS]
    if n % (nd * microbatches):
        raise ValueError(
            f"batch {n} must divide data axis {nd} x microbatches "
            f"{microbatches}")
    mb = n // nd // microbatches
    p = params["params"] if "params" in params else params
    embed_dim = p["fc1_gamma"].shape[0]

    # Segment r runs units [starts[r], ends[r]); boundary r (the hop
    # from rank r to r+1) carries the activation after unit ends[r]-1.
    starts = (0,) + tuple(s + 1 for s in splits)
    ends = tuple(s + 1 for s in splits) + (n_units,)
    bshapes = [boundary_shape(e - 1, images.shape[1], stage_sizes,
                              stage_widths) for e in ends[:-1]]
    blens = [hw * hw * ch for hw, ch in bshapes]
    env_len = max(blens)

    def _pack(x):
        flat = x.astype(jnp.float32).reshape(mb, -1)
        return jnp.pad(flat, ((0, 0), (0, env_len - flat.shape[1])))

    def _segment(r):
        """Branch r of the per-tick switch: unpack this rank's boundary
        (or take the raw microbatch for rank 0), run its units, and
        return (envelope-packed boundary, embeddings) — zeros on the
        lane the rank does not produce."""
        def run(pp, env_in, x_mb):
            if r == 0:
                x = _stem(pp, x_mb, dtype)
            else:
                hw, ch = bshapes[r - 1]
                x = env_in[:, : blens[r - 1]].reshape(mb, hw, hw, ch)
                x = x.astype(dtype)
            for i in range(starts[r], ends[r]):
                x = _unit(pp[f"_IRUnit_{i}"], x, strides[i], dtype)
            if r == n_ranks - 1:
                return (jnp.zeros((mb, env_len), jnp.float32),
                        _head(pp, x, dtype))
            return _pack(x), jnp.zeros((mb, embed_dim), jnp.float32)
        return run

    branches = [_segment(r) for r in range(n_ranks)]
    perm = [(r, r + 1) for r in range(n_ranks - 1)]

    def fwd(pp, imgs):
        # imgs: (n/nd, H, W, 3) — this device's data shard.
        rank = lax.axis_index(MODEL_AXIS)
        mbs = imgs.reshape((microbatches, mb) + imgs.shape[1:])
        # R-1 drain ticks: rank 0 re-feeds early microbatches (their
        # results never reach the collection window and are discarded),
        # later ranks finish the tail of the stream.
        t_idx = jnp.arange(microbatches + n_ranks - 1) % microbatches
        env0 = jnp.zeros((mb, env_len), jnp.float32)

        def tick(env, t):
            out_env, emb = lax.switch(rank, branches, pp, env, mbs[t])
            nxt = lax.ppermute(out_env, MODEL_AXIS, perm=perm)
            return nxt, emb

        _, embs = lax.scan(tick, env0, t_idx)
        # Rank R-1 emits microbatch m at tick m + R - 1; every other
        # rank contributed zeros on the emb lane — a psum over the
        # model axis recovers the real values on every device.
        embs = lax.psum(embs[n_ranks - 1:], MODEL_AXIS)
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
