"""Split-complex (real-pair) linear algebra for complex-less backends.

The axon TPU backend has no complex dtypes, so the Hermitian driver cannot
run its native complex path there.  This module carries complex matrices as
``(re, im)`` real-array pairs and implements the handful of operations the
embedded Hermitian solve needs (reference capability: eigen_h,
src/eigen_h.F:28; here re-based on the classic real symmetric embedding
rather than a complex Householder reduction — see solvers/hermitian.py).

The embedding: a Hermitian A = Ar + i·Ai (Ar symmetric, Ai antisymmetric)
maps to the real symmetric

    M = [[Ar, -Ai],
         [Ai,  Ar]]   (2n × 2n)

with spectrum(M) = spectrum(A) each with doubled multiplicity: if
A(x+iy) = λ(x+iy) then M(x;y) = λ(x;y) and M(-y;x) = λ(-y;x).  Conversely
any real eigenvector (x;y) of M maps to a complex eigenvector x+iy of A
(possibly zero only if (x;y) ∝ (y;-x), which cannot hold for a unit
vector pair picked by the extraction below after the Gram polish).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class ComplexPair(NamedTuple):
    """A complex matrix carried as two real device arrays (re, im).

    ``np.asarray(pair)`` is not defined on purpose — use ``to_numpy()``
    for an explicit host-side complex materialization.
    """

    re: jnp.ndarray
    im: jnp.ndarray

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    def to_numpy(self):
        import numpy as np

        return np.asarray(self.re) + 1j * np.asarray(self.im)


def embed_hermitian(ar: jnp.ndarray, ai: jnp.ndarray) -> jnp.ndarray:
    """M = [[Ar, -Ai], [Ai, Ar]] — real symmetric iff A Hermitian."""
    top = jnp.concatenate([ar, -ai], axis=1)
    bot = jnp.concatenate([ai, ar], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def cmatmul(ar, ai, br, bi) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(A·B) for split-complex operands: 4 real GEMMs."""
    return ar @ br - ai @ bi, ar @ bi + ai @ br


def cgram(zr, zi) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """G = Zᴴ·Z (Hermitian) for split-complex Z."""
    gr = zr.T @ zr + zi.T @ zi
    gi = zr.T @ zi - zi.T @ zr
    return gr, gi


import functools as _ft

import jax as _jax


@_ft.partial(_jax.jit)
def pair_defect(zr, zi):
    """max|ZᴴZ − I| for split-complex Z — the pre-polish defect, without
    materializing an identity or a stacked copy (at n=16k those are n²
    transients the chip cannot spare)."""
    k = zr.shape[1]
    dg = jnp.arange(k)
    gr, gi = cgram(zr, zi)
    gr = gr.at[dg, dg].add(-1.0)
    return jnp.maximum(jnp.max(jnp.abs(gr)), jnp.max(jnp.abs(gi)))


@_ft.partial(_jax.jit, static_argnames=("iters",), donate_argnums=(0, 1))
def _ns_polish(zr, zi, iters: int):
    k = zr.shape[1]
    dg = jnp.arange(k)
    for _ in range(iters):
        gr, gi = cgram(zr, zi)
        # (3I − G)/2 without an eye: −G/2 then +3/2 on the diagonal
        cr = (-0.5 * gr).at[dg, dg].add(1.5)
        ci = -0.5 * gi
        zr, zi = cmatmul(zr, zi, cr, ci)
    return zr, zi


def newton_schulz_unitarize(zr, zi, iters: int = 2, donate: bool = False):
    """Löwdin orthonormalization Z·(ZᴴZ)^{-1/2} by Newton–Schulz:
    Z ← Z·(3I − ZᴴZ)/2, quadratically convergent for ‖ZᴴZ − I‖₂ < 1.

    Used to repair the within-cluster mixing the real→complex column
    extraction can introduce (each eigenvalue of the embedding is doubled;
    picking one real column per pair is only orthogonal across exact
    pairs).  Returns (zr, zi, defect) where defect = max|ZᴴZ − I| BEFORE
    the polish — callers use it to detect a (rank-deficient) pathological
    pick that Newton–Schulz cannot repair.  donate=True lets the polish
    reuse the input buffers (the large-n memory path); the default copies.
    """
    defect = pair_defect(zr, zi)
    if not donate:
        zr = zr + jnp.zeros((), zr.dtype)
        zi = zi + jnp.zeros((), zi.dtype)
    zr, zi = _ns_polish(zr, zi, iters=iters)
    return zr, zi, defect
