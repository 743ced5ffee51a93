"""WY-blocked Householder back-transform (trbakwy4 analogue).

Reference: eigen_common_trbakwy (src/trbakwy4.F:77) applies the TRD
reflectors to the D&C eigenvectors in blocks of m_b=128 with
bcast/reduce-overlap machinery.  On TPU the whole loop is a chain of MXU
GEMMs under one jit — XLA overlaps collectives with compute in the
distributed path, so the reference's hand-tuned overlap auto-tuner
(trbakwy4_body.F:160-190) has no analogue here by design.

Flop model: 2·nvec·n² (reference: src/eigen_s.F:248).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigenexa_tpu.ops.householder import wy_t_factor, apply_wy_left


@functools.partial(jax.jit, static_argnames=("nb",))
def back_transform(z: jnp.ndarray, v: jnp.ndarray, tau: jnp.ndarray,
                   nb: int = 128) -> jnp.ndarray:
    """Z ← Q·Z where Q = H_0·…·H_{n-3} from `tridiagonalize`.

    `z` is (n, nvec) — the eigenvectors of the tridiagonal matrix; returns
    eigenvectors of the original A.  Blocks are applied in reverse order so
    the product telescopes as Q = B_0·(B_1·(…·(B_L·Z))).

    Row slices are static (Python loop), so each block's GEMMs only touch
    the nonzero rows of V — keeping the true 2·nvec·n² flop count rather
    than padding to 2·nvec·n²·2.
    """
    n = z.shape[0]
    # cover n-1 reflector columns: for real input tau[n-2]=0 (no-op), but
    # the Hermitian path uses reflector n-2 as the phase rotation that makes
    # the last sub-diagonal real (zlarfg convention) — it must be applied.
    blocks = list(range(0, max(n - 1, 0), nb))
    for k in reversed(blocks):
        b = min(nb, max(n - 1 - k, 0))
        if b <= 0:
            continue
        vb = v[k:, k : k + b]          # rows < k+1 are structurally zero
        tb = tau[k : k + b]
        t = wy_t_factor(vb, tb)
        zk = apply_wy_left(z[k:, :], vb, t)
        z = z.at[k:, :].set(zk)
    return z
