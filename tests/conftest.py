"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md section 4).  This suite uses
the standard JAX fake backend for TPU-mesh code: force the CPU platform and
split it into 8 virtual devices so every sharding/collective path is
exercised without TPU hardware.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU plugin), so ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars are
read before conftest runs.  ``jax.config.update`` still works because no
backend has been initialised yet.
"""

import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Full-suite memory-map headroom: one pytest process compiles several
# hundred XLA CPU executables, and the process's memory-map count grows
# past the default vm.max_map_count (65530) about two thirds through the
# suite — at which point an mmap inside XLA's compiler fails and the
# process segfaults (reproduced deterministically at the same test,
# cache on or off; every file-level subset passes because it stays
# under the ceiling; /proc/<pid>/maps sampling showed the climb).
# Raise the ceiling when we can (root container); harmless no-op
# otherwise — non-root boxes should `sysctl -w vm.max_map_count=262144`
# or shard the suite across processes (pytest-xdist).
def _ensure_map_headroom(target: int = 262144) -> None:
    # NOTE: this is a system-wide, persistent sysctl change (root only).
    # It is required for the full one-process suite, so it stays on by
    # default, but it announces itself and honours an opt-out for hosts
    # where mutating kernel knobs from a test run is unacceptable.
    import os
    import sys

    if os.environ.get("ALINK_TEST_NO_SYSCTL"):
        return
    knob = pathlib.Path("/proc/sys/vm/max_map_count")
    try:
        current = int(knob.read_text())
        if current < target:
            knob.write_text(str(target))
            print(
                f"[conftest] raised vm.max_map_count {current} -> {target} "
                "(system-wide, persists until reboot; set "
                "ALINK_TEST_NO_SYSCTL=1 to forbid)",
                file=sys.stderr,
            )
    except (OSError, ValueError):
        pass


_ensure_map_headroom()
# bfloat16 matmuls on CPU are emulated and slow; tests use float32 precision.
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: the suite's wall clock is dominated by XLA
# compiles on this box's single CPU core (30+ min cold); cached repeats
# of unchanged programs roughly halve it.  Keyed by HLO hash, so code
# changes recompile exactly what changed.  ALINK_TEST_NO_COMPILE_CACHE=1
# disables it (debugging aid for cache-interaction suspects).
import os

if not os.environ.get("ALINK_TEST_NO_COMPILE_CACHE"):
    _cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_test_cache"
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def mesh8():
    from alink_tpu.parallel import create_mesh

    return create_mesh((4, 2))


@pytest.fixture(scope="session")
def mesh_data():
    from alink_tpu.parallel import create_mesh

    return create_mesh((-1,))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
