"""Attribute the fused blocked loop's remaining per-pivot cost on TPU.

The two Pallas passes (kernels/blocked.py) cover the per-pivot R- and
M-side traffic; what remains per pivot is (a) the XLA glue between them
(ratio test, b/z/base updates, eta appends — ~10 small vector ops), and
per WINDOW (b) the in-place apply `Tt -= F^T @ C` and (c) the exact
re-pricing `costs0 - accum_matvec(Tt, coeffs)` whose full-tableau read
rides the f64-emulation matvec. This script times each piece in its own
jitted fori_loop at the flagship shape so the marginal ms/pivot budget
(bench.py) can be split into kernel / glue / apply / reprice, and the
window size L traded off with data: apply+reprice scale 1/L, the R-side
kernel's live-eta traffic scales L/2.

Run standalone on the TPU (one process!): python tools/profile_outer.py
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
    ap.add_argument("--iters", type=int, default=256,
                    help="per-pivot pieces: loop iterations")
    ap.add_argument("--windows", type=int, default=8,
                    help="per-window pieces: loop iterations")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    from simplex_tpu.config import SolverOptions
    from simplex_tpu.kernels.blocked import (ah_pass, apply_reprice_pass,
                                             apply_window_pass,
                                             colk_costs_pass, ff32_from_f64)
    from simplex_tpu.tableau import accum_matvec, round_up

    n, m, L, K, W = (args.vars, args.constraints, args.block, args.iters,
                     args.windows)
    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64)
    r_pad = round_up(n + 2 * m, 128)
    m_pad = round_up(m, opt.lane_pad)
    log(f"shape: Tt ({m_pad}, {r_pad}) f32, L={L}, K={K}, W={W}")

    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    Tt = jax.random.uniform(ks[0], (m_pad, r_pad), jnp.float32, 0.1, 1.0)
    C = jax.random.uniform(ks[1], (L, r_pad), jnp.float32, 0.0, 1e-6)
    F = jax.random.uniform(ks[2], (L, m_pad), jnp.float32, 0.0, 1e-6)
    costs64 = jax.random.uniform(ks[3], (r_pad,), jnp.float64, -1.0, 1.0)
    chi, clo = ff32_from_f64(costs64)
    b = jax.random.uniform(ks[4], (m_pad,), jnp.float64, 0.1, 1.0)
    base = jax.random.randint(ks[5], (m_pad,), 0, n, jnp.int32)

    def timeit(name, fn, iters, *arrs):
        jfn = jax.jit(fn)
        out = jfn(*arrs)
        float(jax.tree.leaves(out)[0].ravel()[0])    # sync via readback
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*arrs)
            float(jax.tree.leaves(out)[0].ravel()[0])
            times.append(time.perf_counter() - t0)
        best = min(times) / iters * 1e6
        log(f"{name:42s} {best:9.1f} us/iter")
        return best

    def dep_idx(acc, i, bound):
        return ((i * 7919) ^ jnp.int32(acc) % 997) % bound

    # ---- per-pivot pieces ----
    def k_ah(Tt, C, F):
        def body(i, acc):
            h = dep_idx(acc, i, r_pad)
            a_h = ah_pass(Tt, F, C, h)
            return acc + a_h[i % m_pad].astype(jnp.int32)
        return lax.fori_loop(0, K, body, jnp.int32(0))

    def k_colk(Tt, C, F, chi, clo):
        def body(i, carry):
            C, chi, clo, acc = carry
            k = dep_idx(acc, i, m_pad)
            t = jnp.int32(L // 2)      # average live window fill
            C, chi, clo, h_d, _, _, h_b, _, _ = colk_costs_pass(
                Tt, C, F, chi, clo, k, t,
                jnp.float32(1e-9), jnp.float32(0), r=n + 2 * m,
                eps=1e-5)
            return C, chi, clo, acc + h_d
        return lax.fori_loop(0, K, body, (C, chi, clo, jnp.int32(0)))

    def k_glue(b, C, F):
        """Everything inner() does besides the two kernels: ratio test,
        b/z updates, eta-row appends, base scatter."""
        z = jnp.float64(0)

        def body(i, carry):
            b, C, F, z, acc = carry
            a_h32 = F[i % L, :]                    # stand-in entering col
            a_h = a_h32.astype(jnp.float64)
            mask = a_h32 >= 1e-5
            ratios = jnp.where(mask, b / jnp.where(mask, a_h, 1.0),
                               jnp.inf)
            k = jnp.argmin(ratios).astype(jnp.int32)
            p = jnp.maximum(a_h[k], 1.0)
            bk = b[k]
            z = z - 1e-9 * bk
            is_k = jnp.arange(m_pad) == k
            b = jnp.where(is_k, bk / p, b - bk * (a_h / p))
            v = ((a_h / p).at[k].set(1.0 - 1.0 / p)).astype(jnp.float32)
            colk = C[(i + 1) % L, :] * 1.0001
            C = C.at[i % L, :].set(colk)
            F = F.at[i % L, :].set(v)
            return b, C, F, z, acc + k
        return lax.fori_loop(0, K, body, (b, C, F, z, jnp.int32(0)))

    # ---- per-window pieces ----
    def w_apply(Tt, C, F):
        def body(i, carry):
            Tt, acc = carry
            Tt = apply_window_pass(Tt, C, F)
            return Tt, acc + Tt[0, 0]
        return lax.fori_loop(0, W, body, (Tt, jnp.float32(0)))

    def w_reprice(Tt, base, costs64):
        def body(i, carry):
            costs, acc = carry
            valid = base < n + 2 * m
            coeffs = jnp.where(valid, costs64[jnp.minimum(base, r_pad - 1)],
                               0.0)
            exact = costs64 - accum_matvec(Tt, coeffs, 0, jnp.float64)
            return exact, acc + exact[i % r_pad]
        return lax.fori_loop(0, W, body, (costs64, jnp.float64(0)))

    def w_apply_reprice(Tt, C, F, b):
        """The production fused pass: apply + reprice in ONE sweep."""
        bhi, blo = ff32_from_f64(b)

        def body(i, carry):
            Tt, acc = carry
            Tt, hi, lo = apply_reprice_pass(Tt, C, F, bhi, blo)
            return Tt, acc + hi[0]
        return lax.fori_loop(0, W, body, (Tt, jnp.float32(0)))

    def w_candidates(costs64):
        def body(i, carry):
            costs, acc = carry
            masked = jnp.where(jnp.arange(r_pad) < n + 2 * m, costs,
                               jnp.inf)
            h_d = jnp.argmin(masked).astype(jnp.int32)
            h_b = jnp.min(jnp.where(masked <= -1e-5,
                                    jnp.arange(r_pad), 2**31 - 1))
            return costs.at[h_d].set(costs[h_d] + 1e-9), acc + h_b
        return lax.fori_loop(0, W, body, (costs64, jnp.int64(0)))

    k1 = timeit("ah_pass (M-side kernel)", k_ah, K, Tt, C, F)
    k2 = timeit("colk_costs_pass (R-side kernel, t=L/2)", k_colk, K,
                Tt, C, F, chi, clo)
    k3 = timeit("XLA glue (ratio/b/z/eta/base)", k_glue, K, b, C, F)
    w1 = timeit("window apply (Pallas, in-place)", w_apply, W, Tt, C, F)
    wf = timeit("window apply+reprice FUSED (production)",
                w_apply_reprice, W, Tt, C, F, b)
    w2 = timeit("window reprice standalone (accum_matvec f64, UNUSED)",
                w_reprice, W, Tt, base, costs64)
    w3 = timeit("window candidates (argmin f64)", w_candidates, W, costs64)

    per_pivot = k1 + k2 + k3 + (wf + w3) / L
    log(f"--- production model: {k1:.0f} + {k2:.0f} + {k3:.0f} glue "
        f"+ ({wf:.0f} fused + {w3:.0f} cand)/{L} = {per_pivot:.1f} us/pivot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
