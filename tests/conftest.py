"""Test env: 8 virtual CPU devices + x64, set before jax import.

Mirrors the reference's single-box multi-rank test approximation
(benchmark_h/check_s.sh sweeps P=1..24 on one node — SURVEY.md §4.3):
mesh-shape coverage runs on a CPU-simulated 8-device mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU: the ambient environment may pin JAX to the TPU backend (the
# axon site hook overrides JAX_PLATFORMS), but the test suite needs the
# 8-device virtual CPU mesh.  config.update wins over the site hook.
jax.config.update(
    "jax_platforms", os.environ.get("EIGENEXA_TEST_PLATFORM", "cpu")
)
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# persistent compile cache: the four-digit-n tests are compile-dominated
# (n=1024 fused solve ~100 s cold, ~5 s warm); entries are keyed by
# backend+flags so the CPU-mesh tests never collide with on-chip runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
