"""Hermitian n=8192 on the real chip (BASELINE target row).

The axon TPU backend has no complex dtypes, so eigen_h routes through
the real-pair embedding (ops/zreal.py): the 2n×2n [[Ar,−Ai],[Ai,Ar]]
symmetric problem — at n=8192 that is the n=16384 real path (windowed
TRD + per-level D&C + chunked TRBAK).  Checks: Hermitian residual and
orthogonality against the reference thresholds, plus double-run bitwise
reproducibility (benchmark_h/bench_eigen_h.f contract).

Usage: python scripts/bench_hermitian_chip.py [n]
"""

import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    from eigenexa_tpu.ops.zreal import ComplexPair
    from eigenexa_tpu.solvers.hermitian import eigen_h

    print(f"eigen_h n={n} (c64 via real-pair embedding) "
          f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h = ((h + h.conj().T) / 2).astype(np.complex64)

    t0 = time.perf_counter()
    w, z, info = eigen_h(h)
    print(f"first solve (incl. compile): {time.perf_counter()-t0:.1f} s "
          f"(info.elapsed {info.elapsed:.2f} s)", flush=True)
    if isinstance(z, ComplexPair):
        # park the first result on the HOST so the warm solve has the
        # whole chip (at n=16384 a pinned ComplexPair + the solve's
        # working set exceeds the HBM)
        w_h = np.asarray(w)
        z0r = np.asarray(z[0])
        z0i = np.asarray(z[1])
        del w, z
        w2, z2, info2 = eigen_h(h)
        print(f"warm solve: {info2.elapsed:.2f} s", flush=True)
        repro = (np.array_equal(w_h, np.asarray(w2))
                 and np.array_equal(z0r, np.asarray(z2[0]))
                 and np.array_equal(z0i, np.asarray(z2[1])))
        del z0r, z0i
        w, z = w2, z2
        del w2, z2
    else:
        w2, z2, info2 = eigen_h(h)
        print(f"warm solve: {info2.elapsed:.2f} s", flush=True)

    if isinstance(z, ComplexPair):
        # (repro already computed above via the host roundtrip)
        # device-side checks through the real pair (a host complex GEMM
        # at n=16384 takes ~40 min; the chip streams it in seconds):
        #   A·Z = (Ar·Zr − Ai·Zi) + i·(Ar·Zi + Ai·Zr)
        ar = jnp.asarray(np.ascontiguousarray(h.real.astype(np.float32)))
        ai = jnp.asarray(np.ascontiguousarray(h.imag.astype(np.float32)))
        zr_d, zi_d = z[0], z[1]
        wd = jnp.asarray(np.asarray(w, np.float32))
        cc = 4096
        num2 = 0.0
        g2 = 0.0
        with jax.default_matmul_precision("highest"):
            hn = float(jnp.sqrt(jnp.sum(ar * ar) + jnp.sum(ai * ai)))
            for c0 in range(0, n, cc):
                zrc = zr_d[:, c0:c0 + cc]
                zic = zi_d[:, c0:c0 + cc]
                wc = wd[c0:c0 + cc]
                rr = ar @ zrc - ai @ zic - zrc * wc[None, :]
                ri = ar @ zic + ai @ zrc - zic * wc[None, :]
                num2 += float(jnp.sum(rr * rr) + jnp.sum(ri * ri))
                # Gram block: Zᴴ·Z_c = (Zrᵀ Zr_c + Ziᵀ Zi_c)
                #             + i·(Zrᵀ Zi_c − Ziᵀ Zr_c)
                gr = zr_d.T @ zrc + zi_d.T @ zic
                gi = zr_d.T @ zic - zi_d.T @ zrc
                cw = gr.shape[1]
                gr = gr.at[c0 + jnp.arange(cw), jnp.arange(cw)].add(-1.0)
                g2 += float(jnp.sum(gr * gr) + jnp.sum(gi * gi))
        eps = np.finfo(np.float32).eps
        resid = num2 ** 0.5 / (n * eps * hn)
        ortho = g2 ** 0.5 / (n * eps)
    else:
        repro = bool(jnp.array_equal(w, w2)) and bool(
            jnp.array_equal(z, z2))
        zc = np.asarray(z)
        wv = np.asarray(w, np.float64)
        eps = np.finfo(np.float32).eps
        hn = np.linalg.norm(h)
        resid = np.linalg.norm(h @ zc - zc * wv[None, :]) / (n * eps * hn)
        ortho = np.linalg.norm(zc.conj().T @ zc - np.eye(n)) / (n * eps)
    print(f"residual {resid:.3f} {'PASSED' if resid < 768 else 'FAILED'}"
          f" | ortho {ortho:.3f} {'PASSED' if ortho < 8 else 'FAILED'}"
          f" | repro_bitwise {repro}", flush=True)


if __name__ == "__main__":
    main()
