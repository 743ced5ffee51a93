"""Test-matrix generators with known/designed spectra.

Re-implements the behavior of the reference benchmark generator
(reference: benchmark/mat_set.f:41 `mat_set`, :606 `w_set`,
:337 `helmert_trans`) as vectorized jnp code.  Matrix types:

  0  Frank matrix            A[i,j] = min(i,j)+1 (0-based), eigenvalues
                             w_k = 1/(2(1-cos θ)), θ = π(2j+1)/(2n+1)
  1  Toeplitz                diag -7.2, offdiag -3/(i-j)^2 (no known w)
  2  Random symmetric        U(0,1) + transpose (no known w)
  3  Frank matrix 2          A[i,j] = n - max(i,j) (same spectrum as 0)
  4  designed  w_i = i                              (uniform gaps)
  5  designed  w_i = sin^3(5π i/(n-1) + ε^{1/4})    (clustered ±1)
  6  designed  w_i = mod(i,5) + mod(i,2)            (high multiplicity)
  7  designed  w = Frank spectrum
  8  designed  w_i ~ U(0,1)
  9  designed  w_i ~ pseudo-normal
  10 designed  w from a user-supplied array (the reference's W.dat file)

Types 4-10 build A = H·diag(shuffle(w/s))·H^T · s with the Helmert
orthogonal matrix H, so the exact spectrum is an input — this is how the
reference gets exact eigenvalue-error tests for arbitrary spectra.

Generation is pure jnp (jit/shard-friendly); generators return
(A, w_true | None).  Matrix-Market file input (reference types -1/-2) is
provided by `load_matrix_market`.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MATRIX_TYPES = {
    0: "Frank",
    1: "Toeplitz",
    2: "RandomSymmetric",
    3: "Frank2",
    4: "DesignedLinear",
    5: "DesignedSin3",
    6: "DesignedMultiplicity",
    7: "DesignedFrankSpectrum",
    8: "DesignedUniform",
    9: "DesignedNormal",
    10: "DesignedFile",
}


def frank_spectrum(n: int, dtype=jnp.float64) -> jnp.ndarray:
    """Exact Frank-matrix eigenvalues, ascending
    (reference: benchmark/mat_set.f:638-649)."""
    i = np.arange(1, n + 1, dtype=np.float64)
    j = n - i
    theta = np.pi * (2 * j + 1) / (2 * n + 1)
    w = 0.5 / (1.0 - np.cos(theta))
    return jnp.asarray(w, dtype=dtype)


def frank(n: int, dtype=jnp.float64) -> jnp.ndarray:
    # indices in the TARGET dtype: under x64 an int64 n×n intermediate
    # would double the footprint (the TPU backend splits i64 into u32
    # pairs — 12 GB of transients at n=32768 before the cast)
    i = jnp.arange(n, dtype=dtype)
    return jnp.minimum(i[:, None], i[None, :]) + 1


def frank2(n: int, dtype=jnp.float64) -> jnp.ndarray:
    i = jnp.arange(n, dtype=dtype)
    return n - jnp.maximum(i[:, None], i[None, :])


def toeplitz(n: int, dtype=jnp.float64) -> jnp.ndarray:
    i = jnp.arange(n)
    d = i[:, None] - i[None, :]
    off = -3.0 / jnp.where(d == 0, 1, d).astype(dtype) ** 2
    return jnp.where(d == 0, jnp.asarray(-7.2, dtype), off)


def random_symmetric(n: int, dtype=jnp.float64, key=None) -> jnp.ndarray:
    if key is None:
        key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n, n), dtype=dtype)
    return u + u.T


def helmert_matrix(n: int, dtype=jnp.float64) -> jnp.ndarray:
    """Helmert orthogonal matrix H (rows orthonormal).

    Row 0: 1/sqrt(n).  Row i>0: 1/sqrt(i(i+1)) for k<i, -i/sqrt(i(i+1)) at
    k=i, 0 for k>i (reference: benchmark/mat_set.f:395-424, 0-based here).
    """
    i = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    denom = np.sqrt(np.maximum(i * (i + 1), 1.0))
    h = np.where(k < i, 1.0 / denom, np.where(k == i, -i / denom, 0.0))
    h[0, :] = 1.0 / math.sqrt(n)
    return jnp.asarray(h, dtype=dtype)


def designed(
    w: jnp.ndarray, dtype=jnp.float64, shuffle_key=None
) -> jnp.ndarray:
    """A = H^T diag(shuffle(w/s)) H * s — exact spectrum `w`
    (reference: benchmark/mat_set.f:337 helmert_trans)."""
    n = w.shape[0]
    w = jnp.asarray(w, dtype=dtype)
    scale = jnp.maximum(jnp.max(jnp.abs(w)), 1.0)
    ws = w / scale
    if shuffle_key is None:
        shuffle_key = jax.random.PRNGKey(0)
    ws = jax.random.permutation(shuffle_key, ws)
    h = helmert_matrix(n, dtype)
    # A = H^T diag(ws) H, scaled back.  Rows of H are the eigenvectors.
    a = (h.T * ws[None, :]) @ h
    return a * scale


def w_set(n: int, mtype: int, dtype=jnp.float64, w_file=None):
    """Designed spectra (reference: benchmark/mat_set.f:606 w_set)."""
    eps = float(jnp.finfo(dtype).eps)
    eps4 = eps ** 0.25
    if mtype in (0, 3, 7):
        return frank_spectrum(n, dtype)
    if mtype == 4:
        return jnp.arange(n, dtype=dtype)
    if mtype == 5:
        i = jnp.arange(1, n + 1, dtype=dtype)
        theta = jnp.pi * 5 * i / (n - 1) + eps4
        return jnp.sin(theta) ** 3
    if mtype == 6:
        i = jnp.arange(1, n + 1)
        return (i % 5 + i % 2).astype(dtype)
    if mtype == 8:
        return jax.random.uniform(jax.random.PRNGKey(8), (n,), dtype=dtype)
    if mtype == 9:
        return jax.random.normal(jax.random.PRNGKey(9), (n,), dtype=dtype)
    if mtype == 10:
        if w_file is None:
            raise ValueError("mtype 10 needs w_file (array or path to W.dat)")
        if isinstance(w_file, (str,)):
            w = np.loadtxt(w_file).reshape(-1)[:n]
        else:
            w = np.asarray(w_file)[:n]
        return jnp.asarray(w, dtype=dtype)
    raise ValueError(f"no designed spectrum for mtype {mtype}")


def mat_set(
    n: int,
    mtype: int = 0,
    dtype=jnp.float64,
    key=None,
    w_file=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Generate test matrix `mtype`; returns (A, w_true or None).

    w_true is ascending when known (types 0/3/4/7 analytic; 5/6/8/9/10
    designed, returned sorted).
    """
    if mtype == 0:
        return frank(n, dtype), frank_spectrum(n, dtype)
    if mtype == 1:
        return toeplitz(n, dtype), None
    if mtype == 2:
        return random_symmetric(n, dtype, key), None
    if mtype == 3:
        return frank2(n, dtype), frank_spectrum(n, dtype)
    if 4 <= mtype <= 10:
        w = w_set(n, mtype, dtype, w_file)
        a = designed(w, dtype)
        return a, jnp.sort(w)
    if mtype in (-1, -2):
        # Matrix-Market file input (reference: mat_set.f:220-245 reads
        # A.mtx for -1 / B.mtx for -2 from the working directory)
        a = load_matrix_market("A.mtx" if mtype == -1 else "B.mtx", dtype)
        return a, None
    raise ValueError(f"unknown matrix type {mtype}")


def load_matrix_market(path: str, dtype=jnp.float64) -> jnp.ndarray:
    """Matrix-Market coordinate input, symmetrized
    (reference: benchmark/mat_set.f:223-245, types -1/-2)."""
    import scipy.io

    m = scipy.io.mmread(path)
    a = np.asarray(m.todense() if hasattr(m, "todense") else m)
    if not np.allclose(a, a.T):
        a = a + a.T
    return jnp.asarray(a, dtype=dtype)
