"""Reproducible TPU benchmarks (see BENCHMARKS.md)."""
