"""Trustworthy device-completion barrier.

``jax.block_until_ready`` is not reliable on every PJRT backend: the axon
TPU tunnel returns before execution has actually finished (measured: an
n=2048 ``eigh`` "completes" in 0.3 ms by block_until_ready but takes 187 ms
when forced through a host transfer).  Every wall-clock measurement in this
package therefore synchronizes by fetching a scalar that *depends on* each
output array — the 4-byte device-to-host copy cannot begin until the
producing program has committed its result.

This is the measurement analogue of the reference's timer discipline
(eigen_get_wtime barriers, src/eigen_devel.F:182): never read a clock
around work that has not provably finished.
"""

from __future__ import annotations

import jax
import numpy as np


def device_sync(*trees) -> None:
    """Block until every jax array in ``trees`` is fully materialized.

    Fetches one scalar per array (cheap: ~50 µs round-trip on the tunnel
    after warmup) instead of the whole buffer, so syncing on an (n, n)
    eigenvector matrix does not pay the d2h bandwidth of the tunnel
    (~25 MB/s measured).
    """
    for x in jax.tree_util.tree_leaves(trees):
        if not isinstance(x, jax.Array):
            continue
        if x.ndim == 0:
            np.asarray(x)
        else:
            # scalar index: a tiny dependent computation + 1-element copy
            np.asarray(x[(0,) * x.ndim])
