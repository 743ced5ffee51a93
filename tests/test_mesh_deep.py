"""Deep-mesh coverage: 16 and 32 virtual devices (VERDICT r4 item 4).

The suite process pins 8 virtual CPU devices (conftest.py), and a JAX
process cannot change its device count after import — so these tests run
one subprocess per device count with its own
``--xla_force_host_platform_device_count``.  They exercise 4-5 phase-2
group levels of the rows-pinned D&C trees, XOR butterflies spanning both
mesh axes beyond one x-step, and the deeper grouped_allreduce paths —
the regime the reference's FS tree exists for
(src/FS_dividing.F90:22-55; Fugaku job scripts scale to 8192 nodes,
benchmark_h/run_timer1/**).
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({root!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import scipy.linalg
from eigenexa_tpu.parallel.mesh import build_mesh
from eigenexa_tpu.solvers.dc_band_dist import solve_band2_dist
from eigenexa_tpu.solvers.dc_dist import solve_tridiag_dist

shapes = {shapes!r}
ndev = {ndev!r}
assert len(jax.devices()) == ndev, jax.devices()

n = 192
rng = np.random.default_rng(7)
d = jnp.asarray(rng.standard_normal(n))
e = jnp.asarray(rng.standard_normal(n - 1))
w_ref = scipy.linalg.eigh_tridiagonal(
    np.asarray(d), np.asarray(e), eigvals_only=True)
eps = np.finfo(np.float64).eps
t = (np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
     + np.diag(np.asarray(e), -1))

for shape in shapes:
    mesh = build_mesh(devices=jax.devices()[: shape[0] * shape[1]],
                      shape=shape)
    f = jax.jit(lambda d, e: solve_tridiag_dist(d, e, mesh, n, jnp.float64))
    w1, s1 = f(d, e)
    w2, s2 = f(d, e)
    assert bool(jnp.array_equal(w1, w2)), ("bitwise w", shape)
    assert bool(jnp.array_equal(s1, s2)), ("bitwise s", shape)
    np.testing.assert_allclose(np.asarray(w1), w_ref, atol=1e-11)
    s = np.asarray(s1)[:n, :n]
    resid = np.linalg.norm(t @ s - s * np.asarray(w1)[None, :]) / (
        n * eps * np.linalg.norm(t))
    ortho = np.linalg.norm(s.T @ s - np.eye(n)) / (n * eps)
    assert resid < 768 and ortho < 8, (shape, resid, ortho)
    print("tridiag ok", shape, flush=True)

# end-to-end distributed_eigen_s on the first shape (full pipeline:
# shard_map TRD + tree + TRBAK across 4-5 group levels)
from eigenexa_tpu.parallel.distributed import distributed_eigen_s
from eigenexa_tpu.runtime import SolverConfig
from eigenexa_tpu.testing import checks, matgen

ne = 256
ae = matgen.frank(ne, jnp.float64)
mesh_e = build_mesh(devices=jax.devices()[: shapes[0][0] * shapes[0][1]],
                    shape=shapes[0])
we, ze = distributed_eigen_s(
    ae, mesh_e, config=SolverConfig(panel_forward=32, panel_backward=64))
re_ = checks.residual_check(ae, ze, we)
oe = checks.orthogonality_check(ze)
assert re_.passed and oe.passed, (re_, oe)
wchk = checks.eigenvalue_check(we, matgen.frank_spectrum(ne))
assert wchk.passed or wchk.caution, wchk
print("e2e eigen_s ok", shapes[0], flush=True)

# band-2 tree on the last shape (deepest grouped levels)
e2v = jnp.asarray(rng.standard_normal(n - 2))
band = np.zeros((3, n))
band[0] = np.asarray(d)
band[1, : n - 1] = np.asarray(e)
band[2, : n - 2] = np.asarray(e2v)
wb_ref = scipy.linalg.eig_banded(band, lower=True, eigvals_only=True)
mesh = build_mesh(
    devices=jax.devices()[: shapes[-1][0] * shapes[-1][1]],
    shape=shapes[-1])
wb, sb = solve_band2_dist(d, e, e2v, mesh, n, jnp.float64)
np.testing.assert_allclose(np.asarray(wb), wb_ref, atol=1e-11)
sbn = np.asarray(sb)[:n, :n]
assert np.linalg.norm(sbn.T @ sbn - np.eye(n)) < 1e-11
print("band2 ok", shapes[-1], flush=True)
print("DEEP-MESH-OK", flush=True)
"""


def _run_deep(ndev, shapes, timeout=1500):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
        + f" --xla_force_host_platform_device_count={ndev}").strip()
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    script = _SCRIPT.format(root=_ROOT, shapes=shapes, ndev=ndev)
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    assert "DEEP-MESH-OK" in out.stdout


def test_mesh16_tridiag_and_band2_trees():
    """16 devices: (2,8)/(4,4)/(8,2) meshes — 4 phase-2 group levels."""
    _run_deep(16, [(2, 8), (4, 4), (8, 2)])


@pytest.mark.slow
def test_mesh32_tridiag_and_band2_trees():
    """32 devices: (4,8)/(8,4) meshes — 5 phase-2 group levels (slow:
    32-way SPMD on a 2-CPU host)."""
    _run_deep(32, [(4, 8), (8, 4)])
