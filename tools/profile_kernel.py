"""Microbenchmark solve_loop_blocked_kernel's per-pivot pieces on TPU.

Attributes the kernel loop's per-pivot budget at the flagship shape:
the two fused Pallas passes, the strided eta-column gathers C[:, h] and
F[:, k], the f64 ratio test + b update, the eta appends, and the
amortised window apply. Diagnostics to stderr, one line per component.

Run standalone on the TPU (one process!): python tools/profile_kernel.py
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vars", type=int, default=100_000)
    ap.add_argument("--constraints", type=int, default=10_000)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--vector-dtype", default="float64")
    args = ap.parse_args()

    import jax

    if args.vector_dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    from simplex_tpu.kernels.blocked import (ah_pass, colk_costs_pass,
                                             ff32_from_f64)
    from simplex_tpu.tableau import round_up

    n, m, L, K = args.vars, args.constraints, args.block, args.iters
    r_pad = round_up(n + 2 * m, 128)
    m_pad = round_up(m, 128)
    dtype = jnp.float32
    vdtype = jnp.dtype(args.vector_dtype)
    log(f"shape: Tt ({m_pad}, {r_pad}) f32, L={L}, K={K}")

    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    Tt = jax.random.uniform(ks[0], (m_pad, r_pad), dtype, 0.1, 1.0)
    C = jax.random.uniform(ks[1], (L, r_pad), dtype, 0.1, 1.0)
    F = jax.random.uniform(ks[2], (L, m_pad), dtype, 0.1, 1.0)
    costs = jax.random.uniform(ks[3], (r_pad,), vdtype, -1.0, 1.0)
    b = jax.random.uniform(ks[4], (m_pad,), vdtype, 0.1, 1.0)
    chi, clo = ff32_from_f64(costs)

    def timeit(name, fn, *arrs):
        jfn = jax.jit(fn)
        out = jfn(*arrs)
        float(jax.tree.leaves(out)[0].ravel()[0])    # sync via readback
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*arrs)
            float(jax.tree.leaves(out)[0].ravel()[0])
            times.append(time.perf_counter() - t0)
        best = min(times) / K * 1e6
        log(f"{name:36s} {best:9.1f} us/iter")
        return best

    def dep_idx(acc, i, bound):
        return ((i * 7919) ^ jnp.int32(acc % 997)) % bound

    def colk_pass_only(Tt, C, chi, clo):
        def body(i, carry):
            C, chi, clo, acc = carry
            k = dep_idx(acc, i, m_pad)
            u_hi = jnp.float32(1e-7) * acc
            C, chi, clo, h_d, _, _, h_b, _, _ = colk_costs_pass(
                Tt, C, F, chi, clo, k, jnp.int32(L),
                u_hi, jnp.float32(0), r=r_pad - 64, eps=1e-5)
            return C, chi, clo, acc + C[L - 1, 0]
        return lax.fori_loop(0, K, body, (C, chi, clo, jnp.float32(0)))

    def colk_pass_half_live(Tt, C, chi, clo):
        def body(i, carry):
            C, chi, clo, acc = carry
            k = dep_idx(acc, i, m_pad)
            u_hi = jnp.float32(1e-7) * acc
            C, chi, clo, h_d, _, _, h_b, _, _ = colk_costs_pass(
                Tt, C, F, chi, clo, k, jnp.int32(L // 2),
                u_hi, jnp.float32(0), r=r_pad - 64, eps=1e-5)
            return C, chi, clo, acc + C[L // 2, 0]
        return lax.fori_loop(0, K, body, (C, chi, clo, jnp.float32(0)))

    def ah_pass_only(Tt, F):
        def body(i, acc):
            h = dep_idx(acc, i, r_pad)
            ah = ah_pass(Tt, F, C, h)
            return acc + ah[0]
        return lax.fori_loop(0, K, body, jnp.float32(0))

    def gather_C_col(C):
        def body(i, acc):
            h = dep_idx(acc, i, r_pad)
            return acc + C[:, h].sum()
        return lax.fori_loop(0, K, body, jnp.float32(0))

    def gather_F_col(F):
        def body(i, acc):
            k = dep_idx(acc, i, m_pad)
            return acc + F[:, k].sum()
        return lax.fori_loop(0, K, body, jnp.float32(0))

    def ratio_test(b, F):
        def body(i, acc):
            a = F[i % L, :].astype(vdtype)
            mask = a >= 1e-9
            r = jnp.where(mask, b / jnp.where(mask, a, 1.0), jnp.inf)
            return acc + jnp.argmin(r).astype(jnp.int32)
        return lax.fori_loop(0, K, body, jnp.int32(0))

    def b_update(b, F):
        def body(i, carry):
            b, acc = carry
            a = F[i % L, :].astype(vdtype)
            k = dep_idx(acc, i, m_pad)
            bk = b[k]
            is_k = jnp.arange(m_pad) == k
            b = jnp.where(is_k, bk / a[0], b - bk * (a / a[0]))
            return b, acc + b[0].astype(jnp.float32)
        return lax.fori_loop(0, K, body, (b, jnp.float32(0)))

    def eta_append(C, F):
        def body(i, carry):
            C, F, acc = carry
            t = i % L
            rowC = C[(i + 1) % L, :] * 1.0001
            rowF = F[(i + 1) % L, :] * 1.0001
            C = C.at[t, :].set(rowC)
            F = F.at[t, :].set(rowF)
            return C, F, acc + C[t, 0]
        return lax.fori_loop(0, K, body, (C, F, jnp.float32(0)))

    def window_apply(Tt, C, F):
        from simplex_tpu.kernels.blocked import apply_window_pass
        n_windows = max(K // L, 1)

        def body(i, carry):
            Tt, acc = carry
            Tt = apply_window_pass(Tt, C * (1e-9 * (i + 1)), F)
            return Tt, acc + Tt[0, 0]
        return lax.fori_loop(0, n_windows, body, (Tt, jnp.float32(0)))

    def window_apply_xla(Tt, C, F):
        from simplex_tpu.solver import apply_window_T
        n_windows = max(K // L, 1)

        def body(i, carry):
            Tt, acc = carry
            Tt = apply_window_T(Tt, C * (1e-9 * (i + 1)), F)
            return Tt, acc + Tt[0, 0]
        return lax.fori_loop(0, n_windows, body, (Tt, jnp.float32(0)))

    def full_inner(Tt, C, F, chi, clo, b):
        """The actual kernel-loop inner body, one pivot per iteration."""
        from simplex_tpu.kernels.blocked import BIG_INDEX, ff32_to_f64

        def body(i, carry):
            C, F, chi, clo, b, acc = carry
            t = i % L
            h = dep_idx(acc, i, r_pad)
            minc = ff32_to_f64(chi[h], clo[h], vdtype)
            a_h32 = ah_pass(Tt, F, C, h)
            a_h = a_h32.astype(vdtype)
            mask = a_h32 >= 1e-5
            ratios = jnp.where(mask, b / jnp.where(mask, a_h, 1.0),
                               jnp.inf)
            k = jnp.argmin(ratios).astype(jnp.int32)
            p = a_h[k]
            u = minc / jnp.where(p == 0, 1.0, p) * 1e-9
            u_hi, u_lo = ff32_from_f64(u)
            C, chi, clo, h_d, _, _, h_b, _, _ = colk_costs_pass(
                Tt, C, F, chi, clo, k, jnp.int32(t),
                u_hi, u_lo, r=r_pad - 64, eps=1e-5)
            # keep values bounded across K sim pivots (the production
            # loop zeroes C per window; this sim never does)
            C = C.at[t, :].set(C[t] * 1e-9)
            bk = b[k]
            is_k = jnp.arange(m_pad) == k
            b = jnp.where(is_k, bk / p, b - bk * (a_h / p) * 1e-9)
            v = ((a_h / p).at[k].set(1.0 - 1.0 / p)).astype(dtype)
            F = F.at[t, :].set(v * 1e-9)
            return C, F, chi, clo, b, acc + C[t, 0]
        return lax.fori_loop(0, K, body,
                             (C, F, chi, clo, b, jnp.float32(0)))

    timeit("colk_costs_pass (t=L, all live)", colk_pass_only, Tt, C, chi,
           clo)
    timeit("colk_costs_pass (t=L/2 live)", colk_pass_half_live, Tt, C,
           chi, clo)
    timeit("ah_pass", ah_pass_only, Tt, F)
    timeit("gather C[:, h] (strided)", gather_C_col, C)
    timeit("gather F[:, k] (strided)", gather_F_col, F)
    timeit(f"ratio test ({vdtype.name} M)", ratio_test, b, F)
    timeit(f"b update ({vdtype.name} M)", b_update, b, F)
    timeit("eta append C/F rows", eta_append, C, F)
    timeit("window apply (amortised/pivot)", window_apply, Tt, C, F)
    timeit("window apply XLA (amortised)", window_apply_xla, Tt, C, F)
    timeit("FULL inner body", full_inner, Tt, C, F, chi, clo, b)
    return 0


if __name__ == "__main__":
    sys.exit(main())
