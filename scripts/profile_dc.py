"""Fine-grained timing of the host-orchestrated D&C path on the device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from eigenexa_tpu.utils.sync import device_sync  # noqa: E402
import numpy as np  # noqa: E402

from eigenexa_tpu.solvers.dc_host import merge_batch  # noqa: E402
from eigenexa_tpu.solvers.dc_tree import (  # noqa: E402
    _apply_level_gemm,
    _host_leaf_eigh,
    _pad_sizes,
)

n = int(os.environ.get("BENCH_N", "2048"))
leaf = 32
vec_dtype = jnp.float32
n_iter = 16

rng = np.random.default_rng(0)
d = rng.standard_normal(n)
e = rng.standard_normal(n - 1)

for rep in range(2):
    t_total0 = time.perf_counter()
    times = {}

    def mark(key, t0):
        times[key] = times.get(key, 0.0) + (time.perf_counter() - t0)

    m, levels = _pad_sizes(n, leaf)
    span = np.abs(d).max() + np.abs(e).max()
    base = max(span, 1e-30)
    d_pad = np.concatenate([d, 2.0 * base + (base / m) * np.arange(m - n)])
    e_pad = np.concatenate([e, np.zeros(m - n + 1)])
    cuts = np.arange(leaf, m, leaf)
    rho_all = np.abs(e_pad[cuts - 1])
    d_mod = d_pad.copy()
    d_mod[cuts - 1] -= rho_all
    d_mod[cuts] -= rho_all

    nblk = m // leaf
    d_blocks = d_mod.reshape(nblk, leaf)
    e_idx = (np.arange(nblk)[:, None] * leaf
             + np.arange(leaf - 1)[None, :]).reshape(-1)
    e_blocks = e_pad[e_idx].reshape(nblk, leaf - 1)
    t0 = time.perf_counter()
    w, q_np = _host_leaf_eigh(d_blocks, e_blocks)
    mark("leaf", t0)
    row0 = q_np[:, 0, :].copy()
    row1 = q_np[:, -1, :].copy()
    np_vdt = np.dtype(vec_dtype)
    t0 = time.perf_counter()
    q = jnp.asarray(q_np.astype(np_vdt))
    device_sync(q)
    mark("h2d", t0)

    for lvl in range(levels):
        s = leaf * (2**lvl)
        bsz = w.shape[0]
        cut_pos = np.arange(s, m, 2 * s)
        rho = np.abs(e_pad[cut_pos - 1])
        sgn = np.where(e_pad[cut_pos - 1] >= 0, 1.0, -1.0)
        d2 = w.reshape(bsz // 2, 2 * s)
        r0 = row0.reshape(bsz // 2, 2, s)
        r1 = row1.reshape(bsz // 2, 2, s)
        z = np.concatenate([r1[:, 0, :], sgn[:, None] * r0[:, 1, :]], axis=1)
        t0 = time.perf_counter()
        lam, cu = merge_batch(d2, z, rho, n_iter)
        mark("secular", t0)
        t0 = time.perf_counter()
        cu32 = cu.astype(np_vdt)
        mark("cast", t0)
        t0 = time.perf_counter()
        cud = jnp.asarray(cu32)
        device_sync(cud)
        mark("h2d", t0)
        q2 = q.reshape(bsz // 2, 2, s, s)
        t0 = time.perf_counter()
        q = _apply_level_gemm(q2, cud, s)
        device_sync(q)
        mark("gemm", t0)
        t0 = time.perf_counter()
        row0 = np.einsum("bs,bsm->bm", r0[:, 0, :], cu[:, :s, :])
        row1 = np.einsum("bs,bsm->bm", r1[:, 1, :], cu[:, s:, :])
        mark("rows", t0)
        w = lam

    total = time.perf_counter() - t_total0
    print(f"rep{rep}: total {total:.3f}s  " +
          "  ".join(f"{k}={v:.3f}" for k, v in times.items()))
