"""Stage-level persistence: save/load of reduced-band data.

The reference's only checkpoint mechanism is mode 'R': the benchmark reads
precomputed tridiagonal/pentadiagonal data from D.data/E.data/F.data and
runs ONLY the D&C stage (reference: src/eigen_sx.F:175-193; SURVEY.md
§5.4) — a stage-resume/debug tool, not a general checkpointer.  Same
contract here: plain-text one-value-per-line files, same names.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def save_stage_data(dirpath: str, d, e, e2=None) -> None:
    """Write D.data/E.data[/F.data] (reference file names,
    src/eigen_sx.F:201-221 mirror writer)."""
    os.makedirs(dirpath, exist_ok=True)
    np.savetxt(os.path.join(dirpath, "D.data"), np.asarray(d, np.float64))
    np.savetxt(os.path.join(dirpath, "E.data"), np.asarray(e, np.float64))
    if e2 is not None:
        np.savetxt(os.path.join(dirpath, "F.data"),
                   np.asarray(e2, np.float64))


def load_stage_data(
    dirpath: str, dtype=jnp.float64
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Read D.data/E.data[/F.data]; returns (d, e1, e2 or None)."""
    d = jnp.asarray(np.loadtxt(os.path.join(dirpath, "D.data")), dtype)
    e = jnp.asarray(np.loadtxt(os.path.join(dirpath, "E.data")), dtype)
    fpath = os.path.join(dirpath, "F.data")
    e2 = jnp.asarray(np.loadtxt(fpath), dtype) if os.path.exists(fpath) \
        else None
    return d, e, e2
