"""Import smoke tests for the benchmark scripts (TPU-only to *run*, but
they must at least import and build their models everywhere)."""

import importlib

import pytest


@pytest.mark.parametrize("mod", [
    "benchmarks.bench_pairwise",
    "benchmarks.bench_attack",
    "benchmarks.bench_selection",
    "benchmarks.bench_int8_conv",
    "benchmarks.bench_pipeline_sweep",
    "benchmarks.exp_pipeline_prefix",
])
def test_imports(mod):
    m = importlib.import_module(mod)
    assert hasattr(m, "main")


def test_bench_py_imports():
    import bench

    assert callable(bench.main)


@pytest.mark.slow
def test_graft_entry_builds():
    import __graft_entry__ as g

    fn, args = g.entry()
    assert callable(fn)
    assert len(args) == 4
