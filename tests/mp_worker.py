"""Worker process for the real multi-process distributed tests.

Not a test module (no ``test_`` prefix): ``tests/test_distributed_mp.py``
spawns two of these on localhost.  Each worker is its own JAX
single-controller: ``jax.distributed.initialize`` against a shared local
coordinator, 2 virtual CPU devices per process, so the 2-process run
exercises the REAL multi-controller code paths — cross-process mesh
construction, ``make_array_from_process_local_data`` batch assembly, and
a psum-backed global reduction over the process boundary (gRPC playing
the role of DCN).

Usage: python mp_worker.py <pid> <nproc> <port> <mode> <hb_dir>
  mode "clean": full flow, both exit 0.
  mode "kill":  worker 1 exits abruptly (no distributed shutdown) after
                the collective; worker 0 must detect the dead peer via
                the shared-FS Heartbeat and raise/report PeerFailure.
"""

import os
import sys
import time


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, mode, hb_dir = sys.argv[3], sys.argv[4], sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import jax.numpy as jnp
    import numpy as np

    from alink_tpu.parallel import distributed
    from alink_tpu.utils.resilience import Heartbeat, PeerFailure

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc

    mesh = distributed.create_multihost_mesh(model=1)
    assert mesh.devices.shape == (2 * nproc, 1)

    # Every process contributes only ITS rows; the global array is
    # batch-sharded over `data` with no host holding another's rows.
    local = np.full((4, 3), float(pid + 1), np.float32)
    garr = distributed.global_batch_from_local(mesh, local)
    assert garr.shape == (4 * nproc, 3)

    # psum-backed global reduction across the process boundary.
    total = float(jax.jit(jnp.sum)(garr))
    expect = sum(4 * 3 * (p + 1) for p in range(nproc))
    assert total == expect, (total, expect)

    # Deterministic pool sharding: equal-size shards tile the dataset.
    sl = distributed.process_shard(10)
    assert len(sl) == 5  # 2 processes -> 5 rows each
    # Equal local shapes even when P does not divide n (wrap-around).
    assert len(distributed.process_shard(9)) == 5

    hb = Heartbeat(hb_dir, pid, nproc)
    hb.beat()
    # Do not proceed until every peer has beaten once (also exercises
    # the startup-grace path of check_peers).
    deadline = time.time() + 30
    while hb.check_peers(timeout_s=30.0, grace_s=0.0) and \
            time.time() < deadline:
        time.sleep(0.05)

    if mode == "kill":
        if pid == 1:
            print("WORKER1_ABRUPT_EXIT", flush=True)
            os._exit(0)  # no jax.distributed shutdown, no more beats
        # Worker 0: keep beating; peer 1's beacon must go stale.
        detected = None
        deadline = time.time() + 30
        while time.time() < deadline:
            hb.beat()
            try:
                hb.ensure_peers_alive(timeout_s=1.0)
            except PeerFailure as e:
                detected = e
                break
            time.sleep(0.2)
        assert detected is not None, "peer death never detected"
        print(f"PEER_FAILURE_DETECTED: {detected}", flush=True)
        # Skip the distributed atexit shutdown barrier — the dead peer
        # would hang it (which is the point of the scenario).
        sys.stdout.flush()
        os._exit(0)

    print(f"WORKER{pid}_OK", flush=True)


if __name__ == "__main__":
    main()
