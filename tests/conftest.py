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

# XLA's CPU pipeline recurses deeply compiling the four-digit-n fused
# programs; with the default 8 MB main-thread stack this intermittently
# segfaults late in a long suite run (observed in backend_compile and in
# cache serialization).  Raise the stack ceiling — the main thread grows
# lazily up to RLIMIT_STACK on Linux, so this takes effect mid-process.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except Exception:
    pass

# persistent compile cache, READ-ONLY in the suite: the four-digit-n
# tests are compile-dominated (n=1024 fused solve ~100 s cold, ~5 s on a
# cache hit), and standalone runs (bench.py, scripts, single-file pytest)
# populate entries.  Writes are disabled here because XLA's
# executable.serialize() segfaulted repeatedly when invoked late in a
# long suite process (observed 3× in put_executable_and_time across
# different tests); reads never crashed.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_between_modules():
    """XLA:CPU intermittently aborts/segfaults late in long suite runs
    (observed in backend_compile and executable.serialize) once hundreds
    of compiled executables are live in one process.  Dropping the
    compiled-program caches between modules bounds that accumulation;
    within a module (where programs are reused across tests) caching is
    untouched."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _hermetic_default_context():
    """eigen_init() installs a process-global default EigenContext; a test
    that inits with a custom SolverConfig would otherwise leak panel sizes
    into every later no-ctx solve (changing the programs they trace, which
    also defeats the persistent compile cache across test orderings)."""
    yield
    from eigenexa_tpu import runtime

    runtime._DEFAULT_CTX = None
