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
# bfloat16 matmuls on CPU are emulated and slow; tests use float32 precision.
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: the suite's wall clock is dominated by XLA
# compiles on this box's single CPU core (30+ min cold); cached repeats
# of unchanged programs bring the fast lane under the 5-minute claim.
# Keyed by HLO hash, so code changes recompile exactly what changed.
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
