"""Per-stage timing + accuracy breakdown on the current backend."""
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

n = int(os.environ.get("BENCH_N", "2048"))
dtype = jnp.float32

key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (n, n), dtype=jnp.float32)
a = (u + u.T).astype(dtype)
a = jax.device_put(a, jax.devices()[0])

from eigenexa_tpu.ops.householder import tridiagonalize  # noqa: E402
from eigenexa_tpu.solvers import dc  # noqa: E402
from eigenexa_tpu.solvers.trbak import back_transform  # noqa: E402
from eigenexa_tpu.utils.sync import device_sync  # noqa: E402

with jax.default_matmul_precision("highest"):
    # warmup + timed, per stage
    for it in range(2):
        t0 = time.perf_counter()
        trd = tridiagonalize(a, nb=64)
        device_sync(trd)
        t_trd = time.perf_counter() - t0

        t0 = time.perf_counter()
        w, s = dc.solve_tridiag(trd.d, trd.e, vec_dtype=dtype)
        device_sync(w, s)
        t_dc = time.perf_counter() - t0

        t0 = time.perf_counter()
        z = back_transform(s, trd.v, trd.tau, nb=128)
        device_sync(z)
        t_bk = time.perf_counter() - t0
    print(f"n={n} trd={t_trd:.3f}s dc={t_dc:.3f}s trbak={t_bk:.3f}s")

    eps = float(jnp.finfo(dtype).eps)
    def ortho(m):
        k = m.shape[1]
        g = m.T @ m - jnp.eye(k, dtype=m.dtype)
        return float(jnp.linalg.norm(g)) / (k * eps)

    print("ortho(S_dc) =", ortho(s))
    print("ortho(Z)    =", ortho(z))
    # tridiag quality: residual of T vs A through Q — check V/tau quality
    # cheap: apply trbak to identity -> Q; measure ortho(Q)
    q = back_transform(jnp.eye(n, dtype=dtype), trd.v, trd.tau, nb=128)
    print("ortho(Q)    =", ortho(q))
    w_np = np.asarray(w)
    # eigenvalue check vs xla eigh (f32)
    wx = np.asarray(jnp.linalg.eigvalsh(a))
    print("max |w - w_xla| =", float(np.max(np.abs(w_np - wx))),
          " scale", float(np.max(np.abs(wx))))
