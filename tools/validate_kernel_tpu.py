"""Compiled-kernel validation on the real TPU (small shapes, fast).

Interpret-mode semantics are pinned by tests/test_blocked_kernel.py on
CPU; this script checks the actual Mosaic lowering: (1) the two fused
passes against reference math at a toy shape, (2) the kernel-driven
blocked loop against the pure-XLA blocked loop on a real phase-1 solve,
(3) a full two-phase solve() through the production dispatch.

Run alone on the TPU: python tools/validate_kernel_tpu.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from simplex_tpu.config import SolverOptions, Status, \
        kernel_blocked_enabled
    from simplex_tpu.generator import generate_random_problem
    from simplex_tpu.kernels.blocked import (ah_pass, colk_costs_pass,
                                             ff32_from_f64, ff32_to_f64)
    from simplex_tpu.oracle import solve_oracle
    from simplex_tpu.solver import (solve_loop_blocked,
                                    solve_loop_blocked_kernel)
    from simplex_tpu.tableau import (build_phase1, gaussian_eliminate,
                                     phase1_objective, round_up)

    log(f"devices: {jax.devices()}")
    assert jax.default_backend() == "tpu", jax.default_backend()

    # ---- 1. kernels vs reference math, toy shape ----
    m_pad, r_pad, L = 16, 256, 32
    rng = np.random.Generator(np.random.Philox(key=7))
    Tt = jnp.asarray(rng.uniform(-1, 1, (m_pad, r_pad)), jnp.float32)
    C_np = rng.uniform(-1, 1, (L, r_pad)).astype(np.float32)
    C_np[21:] = 0.0
    C = jnp.asarray(C_np)
    Fm = jnp.asarray(rng.uniform(-1, 1, (L, m_pad)), jnp.float32)
    costs = jnp.asarray(rng.uniform(-1, 1, r_pad))
    chi, clo = ff32_from_f64(costs)
    u = jnp.asarray(0.8125)
    u_hi, u_lo = ff32_from_f64(u)
    C2out, chi2, clo2, h_d, vd_hi, vd_lo, h_b, vb_hi, vb_lo = \
        colk_costs_pass(
            Tt, C, Fm, chi, clo, jnp.int32(13), jnp.int32(21), u_hi, u_lo,
            r=250, eps=1e-6)
    colk = np.asarray(C2out)[21]      # written in place into C row t
    np.testing.assert_array_equal(np.asarray(C2out)[:21], C_np[:21])
    w = np.asarray(Fm, np.float64)[:, 13]
    want_colk = (np.asarray(Tt, np.float64)[13]
                 - w @ C_np.astype(np.float64))
    err = np.abs(colk - want_colk).max()
    assert err < 1e-5, f"colk err {err}"
    got_costs = np.asarray(ff32_to_f64(chi2, clo2))
    want_costs = np.asarray(costs) - 0.8125 * colk.astype(np.float64)
    err = np.abs(got_costs - want_costs).max()
    assert err < 1e-12, f"costs pair err {err}"
    masked = np.where(np.arange(r_pad) < 250,
                      got_costs.astype(np.float32), np.inf)
    assert int(h_d) == int(np.argmin(masked)), (int(h_d),
                                                int(np.argmin(masked)))
    F = jnp.asarray(rng.uniform(-1, 1, (L, m_pad)), jnp.float32)
    Cv = jnp.asarray(rng.uniform(-1, 1, (L, r_pad)), jnp.float32)
    for h in (0, 129, 255):
        ah = np.asarray(ah_pass(Tt, F, Cv, jnp.int32(h)))
        v = np.asarray(Cv, np.float64)[:, h]
        want = (np.asarray(Tt, np.float64)[:, h]
                - v @ np.asarray(F, np.float64))
        err = np.abs(ah - want).max()
        assert err < 1e-5, f"ah err {err} at h={h}"
    log("kernel math on TPU: OK")

    # ---- 1a. reprice pass: Mosaic must preserve the Dekker transforms
    # (XLA:CPU's LLVM backend FMA-contracts p - bb and degrades the pair
    # to ~2^-25 relative; on silicon we demand f64 quality) ----
    from simplex_tpu.kernels.blocked import reprice_pass

    mp_r, rp_r = 640, 8192 + 384     # partial r edge block, tm=128 path
    Tt_r = jnp.asarray(rng.uniform(-100, 100, (mp_r, rp_r)), jnp.float32)
    co = jnp.asarray(rng.uniform(-100, 100, mp_r))
    c_hi, c_lo = ff32_from_f64(co)
    hi, lo = reprice_pass(Tt_r, c_hi, c_lo)
    got_mv = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    want_mv = np.asarray(co) @ np.asarray(Tt_r, np.float64)
    scale = np.abs(want_mv).max() + 1.0
    err = np.abs(got_mv - want_mv).max() / scale
    assert err < 1e-9, f"reprice pair err {err} (FMA contraction?)"
    log(f"reprice_pass on TPU: OK (rel err {err:.1e})")

    # ---- 1b. apply pass at a cdiv-partial shape ----
    from simplex_tpu.kernels.blocked import (apply_reprice_pass,
                                             apply_window_pass)
    from simplex_tpu.solver import apply_window_T

    mp2, rp2 = 640, 8192 + 384       # partial edge blocks on both axes
    Tt2 = jnp.asarray(rng.uniform(-1, 1, (mp2, rp2)), jnp.float32)
    C2 = jnp.asarray(rng.uniform(-1, 1, (L, rp2)), jnp.float32)
    F2 = jnp.asarray(rng.uniform(-1, 1, (L, mp2)), jnp.float32)
    got_ap = np.asarray(apply_window_pass(Tt2, C2, F2))
    want_ap = np.asarray(apply_window_T(Tt2, C2, F2))
    err = np.abs(got_ap - want_ap).max()
    assert err < 1e-4, f"apply err {err}"
    log("apply_window_pass on TPU: OK")

    # ---- 1c. fused apply+reprice at the same cdiv-partial shape ----
    co2 = jnp.asarray(rng.uniform(-10, 10, mp2))
    ch2, cl2 = ff32_from_f64(co2)
    got_T, hi2, lo2 = apply_reprice_pass(Tt2, C2, F2, ch2, cl2)
    err = np.abs(np.asarray(got_T) - want_ap).max()
    assert err < 1e-4, f"fused apply err {err}"
    got_mv2 = np.asarray(hi2, np.float64) + np.asarray(lo2, np.float64)
    want_mv2 = np.asarray(co2) @ want_ap.astype(np.float64)
    scale = np.abs(want_mv2).max() + 1.0
    err = np.abs(got_mv2 - want_mv2).max() / scale
    assert err < 1e-6, f"fused reprice pair err {err}"
    log(f"apply_reprice_pass on TPU: OK (reprice rel err {err:.1e})")

    # ---- 2. kernel loop vs XLA blocked loop, real phase-1 ----
    n, m, Lw = 512, 128, 32
    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        eps=1e-5, block_pivots=Lw)
    assert kernel_blocked_enabled(opt)
    p = generate_random_problem(n, m, 4242, 1, 100)
    dims = (round_up(n + 2 * m, 128), round_up(m, 128))
    tab = build_phase1(jnp.asarray(p.A), jnp.asarray(p.b), n, m, opt,
                       dims=dims)
    costs0 = tab.costs
    tab = gaussian_eliminate(tab)
    want_tab, want_s, want_it = jax.jit(
        lambda t: solve_loop_blocked(t, opt, 5000, costs0))(tab)
    got_tab, got_s, got_it = jax.jit(
        lambda t: solve_loop_blocked_kernel(t, opt, 5000, costs0))(tab)
    assert int(got_s) == int(want_s) == int(Status.OPTIMAL), (
        int(got_s), int(want_s))
    z_k = float(phase1_objective(got_tab))
    z_x = float(phase1_objective(want_tab))
    assert z_k > -1e-3 and z_x > -1e-3, (z_k, z_x)
    log(f"phase-1 parity: XLA {int(want_it)} pivots, kernel "
        f"{int(got_it)} pivots, both OPTIMAL (z1 {z_x:.2e}/{z_k:.2e})")

    # ---- 3. production dispatch end-to-end ----
    from simplex_tpu import solve

    want = solve_oracle(p)
    got = solve(p, dtype=np.float32, vector_dtype=np.float64, eps=1e-5,
                block_pivots=Lw)
    assert got.status == Status.OPTIMAL, got
    rel = abs(got.objective - want.objective) / (1 + abs(want.objective))
    assert rel < 1e-4, (got.objective, want.objective)
    log(f"two-phase solve via dispatch: OPTIMAL, rel err {rel:.1e}, "
        f"pivots {got.iterations_phase1}+{got.iterations_phase2}")
    print("VALIDATE_KERNEL_TPU_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
