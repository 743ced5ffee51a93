"""Utilities: profiling, logging, reporting (SURVEY.md §5 aux subsystems)."""

from eigenexa_tpu.utils.profiler import Profiler, profile_region

__all__ = ["Profiler", "profile_region"]
