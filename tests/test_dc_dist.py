"""Distributed D&C merge tree (solvers/dc_dist.py).

The reference-equivalent coverage: FS tree correctness across grid shapes
(FS_dividing/FS_PDLAED1), group-scoped z/d reduction (FS_REDUCE_ZD),
non-power-of-2 fallback (FS non-member ranks, FS_libs.F90:183-208), and
the bitwise per-mesh reproducibility contract (benchmark_h double-run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from eigenexa_tpu.parallel.mesh import build_mesh
from eigenexa_tpu.solvers.dc_dist import solve_tridiag_dist


def _rand_tridiag(n, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal(n)),
            jnp.asarray(rng.standard_normal(n - 1)))


def _check(d, e, w, s, n):
    t = (np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
         + np.diag(np.asarray(e), -1))
    s = np.asarray(s)[:n, :n]
    w = np.asarray(w)
    eps = np.finfo(np.float64).eps
    resid = np.linalg.norm(t @ s - s * w[None, :]) / (
        n * eps * max(np.linalg.norm(t), 1e-300))
    ortho = np.linalg.norm(s.T @ s - np.eye(n)) / (n * eps)
    return resid, ortho


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 8), (2, 2), (1, 4)])
def test_dist_tree_matches_scipy(shape):
    n = 200
    d, e = _rand_tridiag(n)
    mesh = build_mesh(devices=jax.devices()[: shape[0] * shape[1]],
                      shape=shape)
    w, s = jax.jit(
        lambda d, e: solve_tridiag_dist(d, e, mesh, 256, jnp.float64)
    )(d, e)
    w_ref = scipy.linalg.eigh_tridiagonal(
        np.asarray(d), np.asarray(e), eigvals_only=True)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-12)
    resid, ortho = _check(d, e, w, s, n)
    assert resid < 768 and ortho < 8, (shape, resid, ortho)


def test_dist_tree_f32_vectors():
    # mixed precision: f32 eigenvector cascade, f64 secular work
    n = 160
    d, e = _rand_tridiag(n, seed=3)
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    w, s = jax.jit(
        lambda d, e: solve_tridiag_dist(d, e, mesh, 160, jnp.float32)
    )(d, e)
    assert s.dtype == jnp.float32
    w_ref = scipy.linalg.eigh_tridiagonal(
        np.asarray(d), np.asarray(e), eigvals_only=True)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-12)
    s = np.asarray(s, np.float64)[:n, :n]
    eps = np.finfo(np.float32).eps
    ortho = np.linalg.norm(s.T @ s - np.eye(n)) / (n * eps)
    assert ortho < 8, ortho


def test_nonpow2_mesh_falls_back():
    # 3 devices: FS non-member analogue — replicated tree, same answers
    n = 96
    d, e = _rand_tridiag(n, seed=5)
    mesh = build_mesh(devices=jax.devices()[:3], shape=(1, 3))
    w, s = jax.jit(
        lambda d, e: solve_tridiag_dist(d, e, mesh, 96, jnp.float64)
    )(d, e)
    resid, ortho = _check(d, e, w, s, n)
    assert resid < 768 and ortho < 8


@pytest.mark.slow
def test_dist_tree_n2048_bitwise_three_meshes():
    """VERDICT r2 item 2 acceptance: D&C-only at n>=2048 across >=3 mesh
    shapes, bitwise-deterministic per mesh (reference double-run contract,
    benchmark_h/bench_eigen_h.f)."""
    n = 2048
    d, e = _rand_tridiag(n, seed=1)
    w_ref = scipy.linalg.eigh_tridiagonal(
        np.asarray(d), np.asarray(e), eigvals_only=True)
    for shape in [(2, 4), (4, 2), (1, 8)]:
        mesh = build_mesh(devices=jax.devices()[:8], shape=shape)
        f = jax.jit(
            lambda d, e: solve_tridiag_dist(d, e, mesh, n, jnp.float64)
        )
        w1, s1 = f(d, e)
        w2, s2 = f(d, e)
        assert bool(jnp.array_equal(w1, w2))
        assert bool(jnp.array_equal(s1, s2))
        np.testing.assert_allclose(np.asarray(w1), w_ref, atol=1e-11)
        resid, ortho = _check(d, e, w1, s1, n)
        assert resid < 768 and ortho < 8, (shape, resid, ortho)


def test_chunked_top_merge_matches_unchunked():
    """VERDICT r3 item 5: the panel-chunked top-of-tree merge
    (secular.rank1_merge_apply — the FS_PDLAED3 DGEMM-pipeline analogue)
    must agree with the materialized-C path to roundoff."""
    from eigenexa_tpu.solvers.dc_dist import solve_tridiag_dist

    rng = np.random.default_rng(9)
    n = 256
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))
    mesh = build_mesh(devices=jax.devices()[:8], shape=(4, 2))
    w_ref, s_ref = solve_tridiag_dist(d, e, mesh, n, jnp.float64,
                                      chunk_min=10**9)
    w_ch, s_ch = solve_tridiag_dist(d, e, mesh, n, jnp.float64,
                                    chunk_min=64, chunk_panel=32)
    np.testing.assert_allclose(np.asarray(w_ch), np.asarray(w_ref),
                               atol=1e-13, rtol=0)
    assert float(jnp.max(jnp.abs(s_ch - s_ref))) < 1e-12
    # double-run bitwise on the chunked path
    w_ch2, s_ch2 = solve_tridiag_dist(d, e, mesh, n, jnp.float64,
                                      chunk_min=64, chunk_panel=32)
    assert np.array_equal(np.asarray(w_ch), np.asarray(w_ch2))
    assert np.array_equal(np.asarray(s_ch), np.asarray(s_ch2))


@pytest.mark.slow
def test_chunked_top_merge_bounds_transient():
    """Static accounting (XLA memory analysis) that chunking bounds the
    per-device transient: the chunked program's temp footprint must be
    well below the unchunked one, which materializes O(n_pad²)
    work-dtype C matrices per device at the top level."""
    import functools

    from jax.sharding import PartitionSpec as P

    from eigenexa_tpu.solvers import dc_dist

    n = 1024
    rng = np.random.default_rng(10)
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))
    mesh = build_mesh(devices=jax.devices()[:8], shape=(4, 2))
    n_pad, _, rloc = dc_dist._tree_sizes(n, 8, 32)
    d_mod, e_pad = dc_dist._prepare_tree(d, e, n_pad, 32, jnp.float64)

    def temps(chunk_min, chunk_panel):
        body = functools.partial(
            dc_dist._dc_tree_shard, leaf=32, leaf_kind="eigh", n_iter=16,
            work_dtype=jnp.float64, vec_dtype=jnp.float64,
            px=4, py=2, rloc=rloc,
            chunk_min=chunk_min, chunk_panel=chunk_panel)
        f = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(), P(("x", "y"), None)), check_vma=False))
        return f.lower(d_mod, e_pad).compile() \
            .memory_analysis().temp_size_in_bytes

    t_unchunked = temps(10**9, 64)
    t_chunked = temps(256, 64)
    assert t_chunked < 0.7 * t_unchunked, (t_chunked, t_unchunked)


@pytest.mark.slow
def test_band2_dist_tree_matches_scipy():
    """The rows-pinned distributed band-2 two-merge tree
    (solvers/dc_band_dist.py — the HBW=2 twin of the tridiagonal tree)
    must reproduce scipy's banded eigensolver and hold orthogonality.
    (slow: the direct tree program is one of the heaviest CPU compiles in
    the suite; the default-suite distributed_eigen_sx tests exercise the
    same tree end-to-end.)"""
    import scipy.linalg

    from eigenexa_tpu.solvers.dc_band_dist import solve_band2_dist

    rng = np.random.default_rng(21)
    n = 96
    d = jnp.asarray(rng.standard_normal(n))
    e1 = jnp.asarray(rng.standard_normal(n - 1))
    e2 = jnp.asarray(rng.standard_normal(n - 2))
    band = np.zeros((3, n))
    band[0] = np.asarray(d)
    band[1, : n - 1] = np.asarray(e1)
    band[2, : n - 2] = np.asarray(e2)
    w_ref = scipy.linalg.eig_banded(band, lower=True, eigvals_only=True)
    mesh = build_mesh(devices=jax.devices()[:8], shape=(4, 2))
    w, s_pad = solve_band2_dist(d, e1, e2, mesh, 96, jnp.float64)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-12)
    s = np.asarray(s_pad)[:n, :n]
    assert np.linalg.norm(s.T @ s - np.eye(n)) < 1e-12
    # double-run bitwise
    w2, s2 = solve_band2_dist(d, e1, e2, mesh, 96, jnp.float64)
    assert np.array_equal(np.asarray(w), np.asarray(w2))
    assert np.array_equal(np.asarray(s_pad), np.asarray(s2))


def test_band2_chunked_merge_matches_unchunked():
    """VERDICT r4 item 3b: the 5-part chunked merge branch of the
    distributed band-2 tree (dc_band_dist -> rank1_merge_apply_parts,
    the FS_PDLAED3 memory property, reference:
    src/FS_PDLAED3.F90:646-765) was shipped-but-untested — force it with
    a chunk_min override and match the materialized path to roundoff."""
    from eigenexa_tpu.solvers.dc_band_dist import solve_band2_dist

    rng = np.random.default_rng(23)
    n = 96
    d = jnp.asarray(rng.standard_normal(n))
    e1 = jnp.asarray(rng.standard_normal(n - 1))
    e2 = jnp.asarray(rng.standard_normal(n - 2))
    mesh = build_mesh(devices=jax.devices()[:8], shape=(4, 2))
    w_ref, s_ref = solve_band2_dist(d, e1, e2, mesh, 96, jnp.float64,
                                    chunk_min=10 ** 9)
    w_ch, s_ch = solve_band2_dist(d, e1, e2, mesh, 96, jnp.float64,
                                  chunk_min=32, chunk_panel=16)
    np.testing.assert_allclose(np.asarray(w_ch), np.asarray(w_ref),
                               atol=1e-12, rtol=0)
    assert float(jnp.max(jnp.abs(s_ch - s_ref))) < 1e-11
    # double-run bitwise on the chunked path
    w2, s2 = solve_band2_dist(d, e1, e2, mesh, 96, jnp.float64,
                              chunk_min=32, chunk_panel=16)
    assert np.array_equal(np.asarray(w_ch), np.asarray(w2))
    assert np.array_equal(np.asarray(s_ch), np.asarray(s2))


@pytest.mark.slow
def test_production_chunking_n8192():
    """VERDICT r4 item 3a: the PRODUCTION chunk_min=4096 configuration at
    the size where it triggers naturally — the n=8192 distributed tree on
    8 devices is compiled ONCE, its XLA memory-analysis transient bound
    asserted against the unchunked compile, and then EXECUTED with the
    same compiled program (the r03 item 5 acceptance at full size)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from eigenexa_tpu.solvers import dc_dist

    n = 8192
    rng = np.random.default_rng(11)
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))
    mesh = build_mesh(devices=jax.devices()[:8], shape=(4, 2))
    n_pad, _, rloc = dc_dist._tree_sizes(n, 8, 32)
    # the production threshold triggers naturally at this size
    assert n_pad >= dc_dist._CHUNK_MIN_WIDTH
    d_mod, e_pad = dc_dist._prepare_tree(d, e, n_pad, 32, jnp.float64)

    def compiled(chunk_min):
        body = functools.partial(
            dc_dist._dc_tree_shard, leaf=32, leaf_kind="eigh", n_iter=40,  # production default for f64 (dc_dist)
            work_dtype=jnp.float64, vec_dtype=jnp.float64,
            px=4, py=2, rloc=rloc,
            chunk_min=chunk_min, chunk_panel=dc_dist._CHUNK_PANEL)
        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(), P(("x", "y"), None)),
            check_vma=False)).lower(d_mod, e_pad).compile()

    prod = compiled(dc_dist._CHUNK_MIN_WIDTH)
    t_chunked = prod.memory_analysis().temp_size_in_bytes
    t_unchunked = compiled(10 ** 9).memory_analysis().temp_size_in_bytes
    assert t_chunked < 0.7 * t_unchunked, (t_chunked, t_unchunked)

    # execute the production program
    w_full, q = prod(d_mod, e_pad)
    w = np.asarray(w_full)[:n]
    w_ref = scipy.linalg.eigh_tridiagonal(
        np.asarray(d), np.asarray(e), eigvals_only=True)
    # n·ε·‖T‖ ≈ 2e-10 at this size, and scipy's bisection reference
    # carries its own error of the same order — bound at 50× that
    np.testing.assert_allclose(w, w_ref, atol=1e-8)
    # subset residual/orthogonality (a full n^3 check would dominate the
    # suite wall-clock; 512 columns bound the error the same way)
    cols = np.sort(rng.choice(n, 512, replace=False))
    s = np.asarray(q)[:n, :][:, cols]
    eps = np.finfo(np.float64).eps
    ortho = np.linalg.norm(s.T @ s - np.eye(512)) / (n * eps)
    assert ortho < 8, ortho
    dv, ev = np.asarray(d), np.asarray(e)
    ts = dv[:, None] * s
    ts[1:] += ev[:, None] * s[:-1]
    ts[:-1] += ev[:, None] * s[1:]
    resid = np.linalg.norm(ts - s * w[None, cols]) / (
        n * eps * max(np.linalg.norm(dv) + np.linalg.norm(ev), 1e-300))
    assert resid < 768, resid
