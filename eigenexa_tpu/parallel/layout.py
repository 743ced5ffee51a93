"""Index algebra for distributed matrix layouts.

TPU-native re-design of the reference's cyclic(1) index helpers
(eigen_loop_start / eigen_loop_end / eigen_translate_l2g / g2l /
eigen_owner_node / eigen_owner_index — reference: src/eigen_libs0.F:1816,
1902, 1986, 2070, 2154, 2238) and the padded-leading-dimension logic of
``eigen_get_matdims0`` (src/eigen_libs0.F:1254).

Two layouts are provided, all 0-based and vectorized over jnp/np arrays:

* **cyclic(b)** — block-cyclic with block size ``b`` over ``p`` shards
  (b=1 gives the reference's cyclic(1); b=64 gives its ScaLAPACK bridge
  layout, src/dc2.F:166-188).
* **block** — contiguous equal blocks, the natural GSPMD sharding
  (``PartitionSpec('x','y')``).  The heavy GSPMD solver path uses this;
  cyclic layouts are used by shard_map kernels that need load balance over
  a shrinking trailing window.

On TPU the CSTAB cache-alignment machinery (reference: src/CSTAB.F:73) is
replaced by padding local dims to multiples of the lane/sublane tile
(128 / 8) so Pallas/MXU tiles are never ragged.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray, int]

# TPU tiling constants (pallas_guide.md: last dim 128 lanes, 8 sublanes f32).
LANE = 128
SUBLANE = 8


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# cyclic(b) layout: global index g -> (owner, local index)
# ---------------------------------------------------------------------------

def cyclic_owner(g: Array, p: int, b: int = 1) -> Array:
    """Owner shard of global index g under block-cyclic(b) over p shards.

    Analogue of eigen_owner_node (src/eigen_libs0.F:2154), 0-based.
    """
    return (g // b) % p


def cyclic_g2l(g: Array, p: int, b: int = 1) -> Array:
    """Local index on the owner shard (eigen_owner_index, eigen_libs0.F:2238)."""
    return (g // (b * p)) * b + g % b


def cyclic_l2g(l: Array, rank: Array, p: int, b: int = 1) -> Array:
    """Global index of local element l on shard `rank`
    (eigen_translate_l2g, src/eigen_libs0.F:1986)."""
    return (l // b) * (b * p) + rank * b + l % b


def cyclic_local_count(n: int, rank: int, p: int, b: int = 1) -> int:
    """Number of global indices in [0, n) owned by `rank`
    (eigen_loop_end − eigen_loop_start + 1, src/eigen_libs0.F:1816,1902)."""
    full, rem = divmod(n, b * p)
    cnt = full * b
    extra = rem - rank * b
    if extra > 0:
        cnt += min(extra, b)
    return cnt


def cyclic_local_size(n: int, p: int, b: int = 1) -> int:
    """Max local count over shards — the padded local dimension."""
    return cyclic_local_count(n, 0, p, b)


def cyclic_indices(n_local: int, rank: int, p: int, b: int = 1) -> jnp.ndarray:
    """Global indices (possibly ≥ n: caller masks) of the local rows/cols."""
    l = jnp.arange(n_local)
    return cyclic_l2g(l, rank, p, b)


# ---------------------------------------------------------------------------
# block layout (GSPMD natural sharding)
# ---------------------------------------------------------------------------

def block_size(n: int, p: int) -> int:
    return cdiv(n, p)


def block_owner(g: Array, n: int, p: int) -> Array:
    return g // block_size(n, p)


def block_g2l(g: Array, n: int, p: int) -> Array:
    return g % block_size(n, p)


# ---------------------------------------------------------------------------
# padded dimensions (eigen_get_matdims analogue)
# ---------------------------------------------------------------------------

def padded_local_dims(
    n: int, px: int, py: int, b: int = 1, tile: int = LANE
) -> Tuple[int, int]:
    """Per-shard (rows, cols) for an n×n matrix on a px×py grid, padded so the
    local tile is MXU-friendly.

    The analogue of eigen_get_matdims0 (src/eigen_libs0.F:1254): the reference
    pads with CSTAB cache geometry + NB round-up; on TPU we pad to the lane
    tile so the last dim is a multiple of 128 and rows a multiple of 8.
    """
    lr = round_up(max(cyclic_local_size(n, px, b), 1), SUBLANE)
    lc = round_up(max(cyclic_local_size(n, py, b), 1), tile)
    return lr, lc


def padded_n(n: int, p_axis: int, tile: int = LANE) -> int:
    """Pad global n so every shard gets an equal, tile-aligned block.

    Used by the GSPMD path: A is embedded into an N×N matrix
    (N = padded_n) with identity padding so shapes stay static and
    per-device blocks are tile-aligned.
    """
    return round_up(n, p_axis * tile) if n > tile else round_up(n, p_axis)


def check_int32_overflow(n: int, lr: int, lc: int) -> None:
    """64-bit size guard, mirroring the reference's 32-bit overflow check
    (src/eigen_libs0.F:1345-1365).  Python ints are arbitrary precision, so
    this only guards element *counts* that must fit device int32 indexing."""
    if lr * lc >= 2**31:
        raise ValueError(
            f"local block {lr}x{lc} exceeds int32 element indexing; "
            "use a larger mesh"
        )
