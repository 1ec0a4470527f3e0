"""REAL multi-process distributed execution (VERDICT r2 #4).

Everything in ``parallel/distributed.py`` had only ever executed inside
one process; these tests spawn TWO OS processes on localhost, each its
own JAX controller (`jax.distributed.initialize` with a local
coordinator, 2 virtual CPU devices per process), and run:

- ``create_multihost_mesh`` over both processes' devices,
- ``global_batch_from_local`` assembly (no host holds the other's rows),
- a psum-backed global reduction crossing the process boundary,
- a shared-FS ``Heartbeat`` peer detecting an abruptly-killed partner.

gRPC between local processes plays the role of DCN; the collective
decomposition logic is identical.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, port: int, mode: str, hb_dir: str):
    env = dict(os.environ)
    # Children must not inherit this test process's backend choice or
    # grab the real TPU through the preloaded plugin; the worker forces
    # the CPU platform itself before first backend use.
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(_WORKER))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), mode, hb_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)


def _run_pair(mode: str, hb_dir: str, timeout: float = 240.0):
    port = _free_port()
    procs = [_spawn(p, port, mode, hb_dir) for p in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_collective(tmp_path):
    procs, outs = _run_pair("clean", str(tmp_path / "hb"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "WORKER0_OK" in outs[0], outs[0]
    assert "WORKER1_OK" in outs[1], outs[1]


def test_heartbeat_detects_killed_partner(tmp_path):
    procs, outs = _run_pair("kill", str(tmp_path / "hb"))
    assert procs[1].returncode == 0, outs[1]
    assert "WORKER1_ABRUPT_EXIT" in outs[1], outs[1]
    assert procs[0].returncode == 0, outs[0]
    assert "PEER_FAILURE_DETECTED" in outs[0], outs[0]
