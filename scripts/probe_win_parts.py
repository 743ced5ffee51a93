"""Bisect the windowed-TRD worker crash at large n: run one panel
recurrence, then one scan group, then N scan groups.

Usage: python scripts/probe_win_parts.py [n] [stage]
  stage: panel | group1 | groups<k> | full
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

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from eigenexa_tpu.ops import householder as hh  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    stage = sys.argv[2] if len(sys.argv) > 2 else "panel"
    nb = 64
    tm = hh._WIN_TM
    group = hh._round_up(max(4 * nb, hh._round_up(n, tm) // 8), tm)
    log(f"n={n} stage={stage} group={group}")

    from eigenexa_tpu.testing.matgen import frank

    a = frank(n, dtype=jnp.float32)
    a.block_until_ready()
    log("matrix ready")

    if stage == "panel":
        @functools.partial(jax.jit, donate_argnums=(0,))
        def one_panel(b):
            u_p, w_p, tau_p, e_p = hh._panel_win(b, jnp.int32(0), 0, nb,
                                                 False)
            return e_p, tau_p

        e_p, tau_p = one_panel(a)
        print(float(e_p[0]), float(tau_p[0]), flush=True)
        log("one panel OK")
        return

    ngroups = (1 if stage == "group1"
               else int(stage[6:]) if stage.startswith("groups")
               else 10 ** 9)

    @functools.partial(jax.jit, static_argnames=("nb", "group", "ngroups"),
                       donate_argnums=(0,))
    def run_groups(a, nb, group, ngroups):
        from eigenexa_tpu.ops.pallas_kernels import rank2k_update_window

        n = a.shape[0]
        b = a
        d = jnp.zeros((n,), jnp.float32)
        e = jnp.zeros((n,), jnp.float32)
        tau_full = jnp.zeros((n,), jnp.float32)
        groups = {}
        m_act, k = n, 0
        while m_act > nb:
            groups.setdefault(k // group, []).append(k)
            k += nb
            m_act -= nb
        for g in sorted(groups)[:ngroups]:
            t0 = (g * group) // tm

            def body(carry, j0, t0=t0):
                bc, tf, dc, ec = carry
                u_p, w_p, tau_p, e_p = hh._panel_win(bc, j0, t0, nb, False)
                dg = lax.dynamic_slice(bc, (j0, j0), (nb, nb))
                z32 = jnp.int32(0)
                ug = lax.dynamic_slice(u_p, (j0, z32), (nb, nb))
                wg = lax.dynamic_slice(w_p, (j0, z32), (nb, nb))
                diag = jnp.diagonal(dg) - 2.0 * jnp.sum(ug * wg, axis=1)
                bc = rank2k_update_window(bc, u_p, w_p, t0=t0,
                                          interpret=False)
                bc = lax.dynamic_update_slice(bc, u_p, (z32, j0))
                tf = lax.dynamic_update_slice(tf, tau_p, (j0,))
                dc = lax.dynamic_update_slice(dc, diag, (j0,))
                ec = lax.dynamic_update_slice(ec, e_p, (j0,))
                return (bc, tf, dc, ec), None

            ks = jnp.asarray(groups[g], dtype=jnp.int32)
            (b, tau_full, d, e), _ = lax.scan(
                body, (b, tau_full, d, e), ks)
        return d, e, tau_full

    t0c = time.perf_counter()
    d, e, tau = run_groups(a, nb, group, ngroups)
    del a
    print(float(e[0]), float(d[0]), flush=True)
    log(f"{ngroups} group(s) OK in {time.perf_counter()-t0c:.1f} s "
        "(incl compile)")


if __name__ == "__main__":
    main()
