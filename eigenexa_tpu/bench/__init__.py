"""Benchmark application layer (reference: benchmark/main2.f — SURVEY §1 L6)."""

from eigenexa_tpu.bench.runner import run_case, run_input_file, BenchCase

__all__ = ["run_case", "run_input_file", "BenchCase"]
