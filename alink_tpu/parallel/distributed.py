"""Multi-host (multi-slice) execution: DCN data parallelism.

Greenfield (SURVEY.md section 2.4: the reference has no distributed
communication at all — one GPU context, `ALINK.py:22-25`).  Within one
TPU slice the framework's collectives ride ICI (see ``parallel/mesh.py``
and ``parallel/ops.py``); this module adds the pieces needed when the
unlabeled pool or the training replay no longer fits one slice:

- ``initialize()``            — single-controller-per-host bring-up
  (``jax.distributed``); a no-op under one process so all single-host
  code paths are unchanged.
- ``create_multihost_mesh()`` — a (data, model) mesh whose ``data``
  axis spans processes with DCN-adjacent ordering: device order puts
  each process's local devices contiguously, so XLA decomposes a
  ``psum`` over ``data`` into an ICI all-reduce within each slice plus
  one DCN all-reduce across slices — gradient sync and committee means
  never send per-device traffic over DCN.
- ``global_batch_from_local()``— per-host input pipeline: every process
  loads only its shard of the batch (images decoded by its own
  ``native/liballoader``) and the shards assemble into one globally
  sharded jax.Array with zero cross-host data movement.

Exercised THREE ways by the test suite: in-process degenerate paths
(exact), the virtual 8-device CPU mesh, and a REAL 2-process launch —
``tests/test_distributed_mp.py`` spawns two OS processes that
``jax.distributed.initialize`` against a localhost coordinator, build
this mesh across both, assemble a global batch, run a psum-backed
reduction over the process boundary (gRPC standing in for DCN), and
detect an abruptly-killed partner via the shared-FS ``Heartbeat``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alink_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host runtime (no-op for a single process).

    On TPU pods the three arguments are auto-detected from the
    environment; pass them explicitly for CPU/GPU clusters.  Safe to
    call unconditionally at driver start (`drivers/common.py`).

    Single-process detection must NOT touch ``jax.process_count()``:
    that initializes the XLA backends, after which
    ``jax.distributed.initialize`` raises ("must be called before any
    JAX computations").  Instead, detect a multi-host environment from
    the same signals jax.distributed auto-detect uses (explicit args or
    a cluster-environment spec) and otherwise no-op.
    """
    import os

    cluster_env = any(os.environ.get(v) for v in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ))
    # TPU runtimes export TPU_WORKER_HOSTNAMES even on one host
    # (e.g. "localhost"); only a MULTI-worker list implies a pod.
    cluster_env = cluster_env or (
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""))
    if num_processes == 1 or (
        coordinator_address is None and num_processes is None
        and not cluster_env
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_multihost_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices.

    ``data`` is ordered process-major (each host's devices contiguous),
    which is what lets XLA split data-axis collectives into
    ICI-within-slice + DCN-across-slice phases.  ``model`` (committee /
    score-grid columns) always stays within a slice — committee members
    exchange full probability tensors, which must never cross DCN.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    local = jax.local_device_count()
    if model > local or local % model:
        # model <= local is not enough: with the process-major device
        # order, any model that does not DIVIDE the per-process count
        # makes some (data-row) model group straddle two processes —
        # e.g. 5 hosts x 8 devices with model=5 puts devices {5,6,7}
        # (host 0) and {8,9} (host 1) in one group, which is exactly the
        # DCN-crossing committee exchange this check exists to prevent.
        raise ValueError(
            f"model axis ({model}) must divide one process's {local} "
            f"devices — the committee axis must not cross DCN")
    grid = np.asarray(devices).reshape(n // model, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def global_batch_from_local(mesh: Mesh, local_batch) -> jax.Array:
    """Assemble each process's local shard into one global batch array.

    ``local_batch``: this process's rows (numpy or jax) — every process
    must pass the same shape.  The global array has
    ``process_count * local_rows`` rows, batch-sharded over ``data``;
    no host ever materialises another host's rows.
    """
    local_batch = np.asarray(local_batch)
    sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (local_batch.ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape)


def process_shard(n: int) -> np.ndarray:
    """Row indices of a length-``n`` dataset this process should load.

    The A-LINK pool / replay sharding for multi-host runs: file listing
    is deterministic, so no coordination is needed (SURVEY.md section
    2.4's "cross-slice replay sharding").  Every process gets EXACTLY
    ``ceil(n / P)`` rows — ``global_batch_from_local`` requires equal
    local shapes on every process, so when P does not divide n the tail
    processes wrap around to the front rows (deterministic duplication,
    never truncation: every dataset row is owned by some process).
    """
    p, count = jax.process_index(), jax.process_count()
    q = -(-n // count)
    return (p * q + np.arange(q)) % n
