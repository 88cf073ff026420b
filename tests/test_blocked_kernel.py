"""Fused blocked-pivot Pallas passes (kernels/blocked.py), interpret
mode on CPU — the TPU lowering is exercised by bench.py on hardware.
Semantics oracle: the pure-XLA blocked-loop math they replace."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu.config import SolverOptions, Status
from simplex_tpu.generator import generate_random_problem
from simplex_tpu.kernels.blocked import (BIG_INDEX, ah_pass,
                                         colk_costs_pass, ff32_from_f64,
                                         ff32_to_f64)
from simplex_tpu.oracle import solve_oracle
from simplex_tpu.solver import solve_loop_blocked, solve_loop_blocked_kernel
from simplex_tpu.tableau import build_phase1, gaussian_eliminate, round_up


def _rand(shape, key, lo=-1.0, hi=1.0):
    return jax.random.uniform(jax.random.key(key), shape, jnp.float32,
                              lo, hi)


class TestColkCostsPass:
    def setup_method(self, _):
        self.m_pad, self.r_pad, self.L = 16, 256, 8
        self.Tt = _rand((self.m_pad, self.r_pad), 0)
        C = np.array(_rand((self.L, self.r_pad), 1))
        C[5:] = 0.0                      # only t=5 etas live
        self.C = jnp.asarray(C)
        self.F = _rand((self.L, self.m_pad), 2)
        self.costs = jnp.asarray(
            np.random.Generator(np.random.Philox(3)).uniform(
                -1, 1, self.r_pad))      # float64 under x64
        self.r = 250                     # 6 padded rows

    def run_pass(self, k=7, t=5, u=0.375):
        chi, clo = ff32_from_f64(self.costs)
        u_arr = jnp.asarray(u, self.costs.dtype)
        u_hi, u_lo = ff32_from_f64(u_arr)
        return colk_costs_pass(
            self.Tt, self.C, self.F, chi, clo, jnp.int32(k), jnp.int32(t),
            u_hi, u_lo, r=self.r, eps=1e-6, interpret=True)

    def test_colk_and_costs_match_reference_math(self):
        k, u, t = 7, 0.375, 5
        C2, chi2, clo2, h_d, vd_hi, vd_lo, h_b, vb_hi, vb_lo = \
            self.run_pass(k=k, t=t, u=u)
        colk = np.asarray(C2)[t]          # written in place into row t
        T = np.asarray(self.Tt, np.float64)
        C = np.asarray(self.C, np.float64)
        w = np.asarray(self.F, np.float64)[:, k]
        want_colk = T[k] - w @ C
        np.testing.assert_allclose(colk, want_colk, atol=1e-5)
        # Rows other than t are untouched (in-place alias semantics).
        np.testing.assert_array_equal(np.asarray(C2)[:t], C[:t])
        # The cost pair is updated with the kernel's own (f32) colk; the
        # double-f32 arithmetic itself is error-free to ~2^-48.
        want_costs = (np.asarray(self.costs)
                      - u * colk.astype(np.float64))
        got_costs = np.asarray(ff32_to_f64(chi2, clo2))
        np.testing.assert_allclose(got_costs, want_costs, atol=1e-12)

        masked = np.where(np.arange(self.r_pad) < self.r, got_costs,
                          np.inf)
        assert int(h_d) == int(np.argmin(masked.astype(np.float32)))
        # The candidate's (hi, lo) value pair rides along exactly.
        np.testing.assert_array_equal(
            np.asarray(vd_hi), np.asarray(chi2)[int(h_d)])
        np.testing.assert_array_equal(
            np.asarray(vd_lo), np.asarray(clo2)[int(h_d)])
        eligible = np.nonzero(masked.astype(np.float32) <= -1e-6)[0]
        want_hb = int(eligible[0]) if eligible.size else BIG_INDEX
        assert int(h_b) == want_hb
        if eligible.size:
            np.testing.assert_array_equal(
                np.asarray(vb_hi), np.asarray(chi2)[want_hb])
            np.testing.assert_array_equal(
                np.asarray(vb_lo), np.asarray(clo2)[want_hb])

    def test_liveness_ignores_dead_segments(self):
        """Eta rows >= t are zero; passing a larger t must not change
        the result (the extra segments contribute nothing)."""
        a = self.run_pass(t=5)
        b = self.run_pass(t=7)           # reads the dead rows 5, 6 too
        np.testing.assert_array_equal(np.asarray(a[0])[5],
                                      np.asarray(b[0])[7])
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_identity_pass_when_u_zero(self):
        chi, clo = ff32_from_f64(self.costs)
        C2, chi2, clo2, h_d, _, _, h_b, _, _ = self.run_pass(u=0.0)
        np.testing.assert_array_equal(np.asarray(chi2), np.asarray(chi))
        np.testing.assert_array_equal(np.asarray(clo2), np.asarray(clo))

    def test_skipped_pivot_writes_zero_row(self):
        """do=False: the eta row is zeroed (a skipped pivot must leave
        C's row t dead), costs unchanged under u=0."""
        chi, clo = ff32_from_f64(self.costs)
        C2, *_ = colk_costs_pass(
            self.Tt, self.C, self.F, chi, clo, jnp.int32(7), jnp.int32(5),
            jnp.float32(0), jnp.float32(0), r=self.r, eps=1e-6,
            do=jnp.asarray(False), interpret=True)
        np.testing.assert_array_equal(np.asarray(C2)[5],
                                      np.zeros(self.r_pad, np.float32))

    def test_pivot_row_not_8_aligned(self):
        C2, *_ = self.run_pass(k=13)
        want = (np.asarray(self.Tt, np.float64)[13]
                - np.asarray(self.F, np.float64)[:, 13] @ np.asarray(
                    self.C, np.float64))
        np.testing.assert_allclose(np.asarray(C2)[5], want, atol=1e-5)

    @pytest.mark.parametrize("t", [5, 32, 33, 63])
    def test_multi_segment_liveness(self, t):
        """L=64 -> two SEG=32 liveness segments (production L=128+ runs
        4+; every other test here uses L=8 -> a single segment). The
        dead-segment index aliasing and the ``s < live`` accumulation
        gate must yield the exact reference math at every window fill:
        partially through segment 0 (t=5), at the boundary (t=32), one
        row into segment 1 (t=33), and nearly full (t=63)."""
        L, r_pad, m_pad = 64, 384, 16
        Tt = _rand((m_pad, r_pad), 30)
        C = np.array(_rand((L, r_pad), 31))
        C[t:] = 0.0                      # rows >= t are dead by contract
        F = _rand((L, m_pad), 32)
        w = np.asarray(F, np.float64)[:, 9]
        costs = jnp.asarray(
            np.random.Generator(np.random.Philox(33)).uniform(
                -1, 1, r_pad))
        chi, clo = ff32_from_f64(costs)
        C2, chi2, clo2, h_d, _, _, h_b, _, _ = colk_costs_pass(
            Tt, jnp.asarray(C), F, chi, clo, jnp.int32(9), jnp.int32(t),
            jnp.float32(0.25), jnp.float32(0), r=r_pad, eps=1e-6,
            interpret=True)
        colk = np.asarray(C2)[t]
        want = (np.asarray(Tt, np.float64)[9]
                - w @ C.astype(np.float64))
        np.testing.assert_allclose(colk, want, atol=1e-5)
        want_costs = (np.asarray(costs)
                      - 0.25 * colk.astype(np.float64))
        np.testing.assert_allclose(np.asarray(ff32_to_f64(chi2, clo2)),
                                   want_costs, atol=1e-12)


class TestTileChoice:
    """Mosaic requires lane-axis block dims be a multiple of 128 or the
    full axis; grids are cdiv so tiles need not divide the axis (Pallas
    masks partial edge blocks). Pin this at the flagship padded dims
    (m=10k x n=100k), where a 632-lane tile once failed the lowering."""

    @pytest.mark.parametrize("dim,target", [
        (120064, 8192), (10112, 2048), (10112, 512), (120064, 4096),
        (256, 8192), (128, 2048)])
    def test_tiles_lane_legal(self, dim, target):
        from simplex_tpu.kernels.blocked import cdiv, pick_tile

        t = pick_tile(dim, 128, target)
        assert t % 128 == 0 or t == dim
        assert cdiv(dim, t) * t >= dim

    @pytest.mark.parametrize("dim,unit,target,want_divides", [
        (10112, 8, 896, True),     # flagship SUBLANE axis (constraints
                                   # M_pad): 632 = 8*79 divides
        (120064, 8, 896, True),    # flagship lane axis: 896*134
        (24704, 8, 896, False),    # 2^7*193: no divisor in range
        (512, 8, 896, True),       # dim <= target: whole axis
    ])
    def test_pick_tile_div(self, dim, unit, target, want_divides):
        from simplex_tpu.kernels.blocked import pick_tile, pick_tile_div

        t = pick_tile_div(dim, unit, target)
        assert t % unit == 0 and t <= max(target, dim)
        if want_divides:
            assert dim % t == 0
            assert target // 2 <= t <= max(target, dim)
        else:
            # no divisor in [target/2, target]: falls back to pick_tile
            assert t == pick_tile(dim, unit, target)

    def test_partial_edge_block_matches_math(self):
        """colk pass on an r_pad NOT divisible by the tile target still
        matches the reference math (exercises the cdiv edge block)."""
        m_pad, r_pad, L = 16, 8192 + 256, 8
        t = L - 1
        Tt = _rand((m_pad, r_pad), 7)
        C = np.array(_rand((L, r_pad), 8))
        C[t:] = 0.0                      # rows >= t dead by contract
        F = _rand((L, m_pad), 9)
        costs = jnp.asarray(
            np.random.Generator(np.random.Philox(10)).uniform(
                -1, 1, r_pad))
        chi, clo = ff32_from_f64(costs)
        C2, chi2, clo2, h_d, _, _, h_b, _, _ = colk_costs_pass(
            Tt, jnp.asarray(C), F, chi, clo, jnp.int32(3), jnp.int32(t),
            jnp.float32(0.25), jnp.float32(0), r=r_pad - 100, eps=1e-6,
            interpret=True)
        want = (np.asarray(Tt, np.float64)[3]
                - np.asarray(F, np.float64)[:, 3] @ C.astype(np.float64))
        np.testing.assert_allclose(np.asarray(C2)[t], want, atol=1e-5)


class TestApplyWindowPass:
    def test_matches_xla_apply(self):
        from simplex_tpu.kernels.blocked import apply_window_pass
        from simplex_tpu.solver import apply_window_T

        m_pad, r_pad, L = 24, 384, 8
        Tt = _rand((m_pad, r_pad), 20)
        C = _rand((L, r_pad), 21)
        F = _rand((L, m_pad), 22)
        got = apply_window_pass(Tt, C, F, interpret=True)
        want = apply_window_T(Tt, C, F)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestApplyRepricePass:
    @pytest.mark.parametrize("m_pad,r_pad,L", [
        (24, 384, 8),          # toy shapes, tm = m_pad
        (136, 8192 + 256, 8),  # cdiv edge blocks on both axes (masked
                               # coeff rows on the partial m tile)
    ])
    def test_matches_apply_then_matvec(self, m_pad, r_pad, L):
        from simplex_tpu.kernels.blocked import apply_reprice_pass
        from simplex_tpu.solver import apply_window_T

        Tt = _rand((m_pad, r_pad), 50)
        C = _rand((L, r_pad), 51)
        F = _rand((L, m_pad), 52)
        coeffs = jnp.asarray(
            np.random.Generator(np.random.Philox(53)).uniform(
                -10, 10, m_pad))
        c_hi, c_lo = ff32_from_f64(coeffs)
        got_T, hi, lo = apply_reprice_pass(Tt, C, F, c_hi, c_lo,
                                           interpret=True)
        want_T = np.asarray(apply_window_T(Tt, C, F))
        np.testing.assert_allclose(np.asarray(got_T), want_T, atol=1e-5)
        got_mv = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        want_mv = np.asarray(coeffs) @ want_T.astype(np.float64)
        scale = np.max(np.abs(want_mv)) + 1.0
        # 1e-7*scale: XLA:CPU FMA contraction, see TestRepricePass
        np.testing.assert_allclose(got_mv, want_mv, atol=1e-7 * scale)

    def test_flagship_m_axis_tile_is_lane_legal(self):
        """m_pad=10112 (the flagship constraint axis, 79*128): no
        128-multiple in [448, 896] divides it, so the default tm must
        fall back to a lane-legal 128-multiple with a masked edge tile —
        NOT the 8-aligned divisor 632, whose F-block lane dim fails the
        Mosaic lowering on silicon (regression: bench.py compile crash)."""
        from simplex_tpu.kernels.blocked import apply_reprice_pass
        from simplex_tpu.solver import apply_window_T

        m_pad, r_pad, L = 10112, 256, 8
        Tt = _rand((m_pad, r_pad), 70)
        C = _rand((L, r_pad), 71)
        F = _rand((L, m_pad), 72)
        coeffs = jnp.asarray(
            np.random.Generator(np.random.Philox(73)).uniform(
                -10, 10, m_pad))
        c_hi, c_lo = ff32_from_f64(coeffs)
        got_T, hi, lo = apply_reprice_pass(Tt, C, F, c_hi, c_lo,
                                           interpret=True)
        want_T = np.asarray(apply_window_T(Tt, C, F))
        np.testing.assert_allclose(np.asarray(got_T), want_T, atol=1e-5)
        got_mv = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        want_mv = np.asarray(coeffs) @ want_T.astype(np.float64)
        scale = np.max(np.abs(want_mv)) + 1.0
        np.testing.assert_allclose(got_mv, want_mv, atol=1e-7 * scale)

    @pytest.mark.parametrize("tile_m,tile_r", [
        (64, 256),    # m tiles divide, r edge block masked
        (48, 512),    # cdiv edge m tile: coeff rows masked past m_pad
        (136, 8448),  # single-tile degenerate grid
    ])
    def test_explicit_tiles_match(self, tile_m, tile_r):
        """The tunable tile sizes (perf scans) keep edge-tile masking
        correct: out-of-bounds coeff rows contribute nothing."""
        from simplex_tpu.kernels.blocked import apply_reprice_pass
        from simplex_tpu.solver import apply_window_T

        m_pad, r_pad, L = 136, 8192 + 256, 8
        Tt = _rand((m_pad, r_pad), 60)
        C = _rand((L, r_pad), 61)
        F = _rand((L, m_pad), 62)
        coeffs = jnp.asarray(
            np.random.Generator(np.random.Philox(63)).uniform(
                -10, 10, m_pad))
        c_hi, c_lo = ff32_from_f64(coeffs)
        got_T, hi, lo = apply_reprice_pass(
            Tt, C, F, c_hi, c_lo, interpret=True,
            tile_m=tile_m, tile_r=tile_r)
        want_T = np.asarray(apply_window_T(Tt, C, F))
        np.testing.assert_allclose(np.asarray(got_T), want_T, atol=1e-5)
        got_mv = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        want_mv = np.asarray(coeffs) @ want_T.astype(np.float64)
        scale = np.max(np.abs(want_mv)) + 1.0
        np.testing.assert_allclose(got_mv, want_mv, atol=1e-7 * scale)


class TestRepricePass:
    @pytest.mark.parametrize("m_pad,r_pad", [
        (16, 256),            # toy: tm = m_pad fallback
        (128, 384),           # tm = 128, multi r tile
        (256, 8192 + 128),    # partial r edge block (output-masked)
    ])
    def test_matches_f64_matvec(self, m_pad, r_pad):
        from simplex_tpu.kernels.blocked import reprice_pass

        Tt = _rand((m_pad, r_pad), 40, lo=-100.0, hi=100.0)
        coeffs = jnp.asarray(
            np.random.Generator(np.random.Philox(41)).uniform(
                -100, 100, m_pad))
        c_hi, c_lo = ff32_from_f64(coeffs)
        hi, lo = reprice_pass(Tt, c_hi, c_lo, interpret=True)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        want = np.asarray(coeffs) @ np.asarray(Tt, np.float64)
        # Interpret mode runs under XLA:CPU, whose LLVM backend contracts
        # the fresh product p = c*T into downstream subtractions
        # (p - bb -> fma(c, T, -bb)), voiding the Dekker two_prod
        # guarantee and leaving ~one f32 rounding of the total (~2^-25
        # relative). Mosaic on real TPU does NOT contract — the tight
        # f64-quality bound (1e-9 relative) is asserted on silicon by
        # tools/validate_kernel_tpu.py; here we pin the contraction-
        # degraded level, which is still 30x tighter than a plain f32
        # accumulation at these shapes.
        scale = np.max(np.abs(want)) + 1.0
        np.testing.assert_allclose(got, want, atol=1e-7 * scale)

    def test_zero_coeffs_zero_result(self):
        from simplex_tpu.kernels.blocked import reprice_pass

        Tt = _rand((64, 256), 42)
        z = jnp.zeros((64,), jnp.float32)
        hi, lo = reprice_pass(Tt, z, z, interpret=True)
        assert not np.asarray(hi).any() and not np.asarray(lo).any()


class TestAhPass:
    @pytest.mark.parametrize("h", [0, 129, 255])
    def test_matches_reference_math(self, h):
        m_pad, r_pad, L = 24, 256, 8
        Tt = _rand((m_pad, r_pad), 4)
        F = _rand((L, m_pad), 5)
        C = _rand((L, r_pad), 6)
        got = ah_pass(Tt, F, C, jnp.int32(h), interpret=True)
        v = np.asarray(C, np.float64)[:, h]
        want = (np.asarray(Tt, np.float64)[:, h]
                - v @ np.asarray(F, np.float64))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    @pytest.mark.parametrize("t", [0, 1, 5, 9, 16])
    def test_liveness_skips_dead_segments(self, t):
        """With window fill t, eta rows >= t are zero (the solver's
        invariant); the liveness-aware pass must match the full read
        at every fill level, across the multi-segment grid."""
        m_pad, r_pad, L, seg = 24, 256, 16, 4
        Tt = _rand((m_pad, r_pad), 14)
        F = np.array(_rand((L, m_pad), 15))
        C = np.array(_rand((L, r_pad), 16))
        F[t:] = 0.0
        C[t:] = 0.0
        Fj, Cj = jnp.asarray(F), jnp.asarray(C)
        got = ah_pass(Tt, Fj, Cj, jnp.int32(7), jnp.int32(t),
                      interpret=True, seg_rows=seg)
        v = C.astype(np.float64)[:, 7]
        want = (np.asarray(Tt, np.float64)[:, 7]
                - v @ F.astype(np.float64))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestKernelLoopEndToEnd:
    """solve_loop_blocked_kernel (interpret mode) against the pure-XLA
    blocked loop and the oracle on a real phase-1 solve."""

    def _phase1_tab(self, n=96, m=24, seed=11, L=8):
        opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                            eps=1e-5, block_pivots=L)
        p = generate_random_problem(n, m, seed, 1, 100)
        dims = (round_up(n + 2 * m, 128), round_up(m, 128))
        tab = build_phase1(jnp.asarray(p.A), jnp.asarray(p.b), n, m, opt,
                           dims=dims)
        costs0 = tab.costs
        return gaussian_eliminate(tab), costs0, opt, p

    def test_matches_xla_blocked_loop(self):
        """Same phase-1 outcome as the pure-XLA blocked loop. The exact
        pivot path may diverge on reduced-cost near-ties (the kernel's
        Dantzig argmin reads the f32 hi part, the XLA loop the f64
        vector) — both walks are valid simplex; outcome parity is the
        contract (documented divergence, same as blocked-vs-sequential).
        """
        from simplex_tpu.tableau import phase1_objective

        tab, costs0, opt, _ = self._phase1_tab()
        want_tab, want_status, want_iters = solve_loop_blocked(
            tab, opt, 2000, costs0)
        got_tab, got_status, got_iters = solve_loop_blocked_kernel(
            tab, opt, 2000, costs0, interpret=True)
        assert int(got_status) == int(want_status) == int(Status.OPTIMAL)
        # Phase-1 optimum (all artificials priced out) reached by both.
        assert float(phase1_objective(got_tab)) > -1e-4
        assert float(phase1_objective(want_tab)) > -1e-4
        assert abs(int(got_iters) - int(want_iters)) <= max(
            3, int(want_iters) // 10)

    def test_full_solve_matches_oracle(self):
        """Two-phase solve with the kernel loop spliced in for both
        phases (interpret mode), objective vs the oracle."""
        from simplex_tpu.tableau import (Tableau, count_basic_artificials,
                                         extract_solution,
                                         phase1_objective)

        n, m = 64, 16
        tab, costs0, opt, p = self._phase1_tab(n=n, m=m, seed=3)
        tab, s1, _ = solve_loop_blocked_kernel(tab, opt, 2000, costs0,
                                               interpret=True)
        assert int(s1) == int(Status.OPTIMAL)
        assert float(phase1_objective(tab)) > -1e-4
        assert int(count_basic_artificials(tab)) == 0
        # phase-2 reset with the kernel's 128-row padding (on TPU
        # tableau.padded_dims does this via kernel_blocked_enabled).
        r2_pad = round_up(n + m, 128)
        costs2 = jnp.zeros((r2_pad,), tab.costs.dtype).at[:n].set(
            -jnp.asarray(p.c, tab.costs.dtype))
        tab2 = Tableau(T=tab.T[:r2_pad], b=tab.b, costs=costs2, z=tab.z,
                       base=tab.base, n=n, m=m, r=n + m)
        costs0_2 = tab2.costs
        tab2 = gaussian_eliminate(tab2)
        tab2, s2, _ = solve_loop_blocked_kernel(tab2, opt, 2000, costs0_2,
                                                interpret=True)
        assert int(s2) == int(Status.OPTIMAL)
        x = np.asarray(extract_solution(tab2))
        want = solve_oracle(p)
        assert float(np.dot(p.c, x)) == pytest.approx(want.objective,
                                                      rel=1e-4)

    @pytest.mark.parametrize("every", [2, 4])
    def test_reprice_cadence_matches_oracle(self, every):
        """reprice_every > 1 skips the re-price arithmetic on off-cadence
        windows (the in-window double-f32 cost updates are ~2^-48 exact,
        so skipping only defers slow tableau-noise correction); the solve
        must still end OPTIMAL at the oracle objective, and a window
        ending non-RUNNING always re-prices so the premature-optimal
        check stays exact."""
        from simplex_tpu.tableau import phase1_objective

        opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                            eps=1e-5, block_pivots=8,
                            reprice_every=every)
        p = generate_random_problem(96, 24, 11, 1, 100)
        dims = (round_up(96 + 48, 128), round_up(24, 128))
        tab = build_phase1(jnp.asarray(p.A), jnp.asarray(p.b), 96, 24,
                           opt, dims=dims)
        costs0 = tab.costs
        tab = gaussian_eliminate(tab)
        got_tab, got_status, got_iters = solve_loop_blocked_kernel(
            tab, opt, 2000, costs0, interpret=True)
        assert int(got_status) == int(Status.OPTIMAL)
        assert float(phase1_objective(got_tab)) > -1e-4

    def test_reprice_cadence_sharded_matches_oracle(self):
        """Cadence wiring in the sharded mirror (CPU mesh, interpret)."""
        import jax
        from jax.sharding import Mesh

        from simplex_tpu.parallel.sharded import make_sharded_solver

        opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                            eps=1e-5, block_pivots=8, reprice_every=4)
        p = generate_random_problem(96, 24, seed=7, lo=1.0, hi=100.0)
        mesh = Mesh(np.array(jax.devices()[:4]), ("vars",))
        fn = make_sharded_solver(mesh, 96, 24, opt, interpret=True)
        out = jax.device_get(fn(jnp.asarray(p.A), jnp.asarray(p.b),
                                jnp.asarray(p.c)))
        want = solve_oracle(p)
        assert int(out.status) == int(Status.OPTIMAL)
        assert float(out.objective) == pytest.approx(want.objective,
                                                     rel=1e-4)

    @pytest.mark.parametrize("L", [12, 20])
    def test_unaligned_L_falls_back_to_xla_loop(self, L):
        """block_pivots >= 8 but not a multiple of 8 must NOT take the
        kernel path: the in-place C-slab write would read its
        pass-through rows at a misaligned offset and silently corrupt
        live eta columns (r3 review finding). The dispatch falls back to
        the pure-XLA blocked loop and still reaches the oracle optimum;
        calling the kernel pass directly with such L is rejected."""
        from simplex_tpu import solve
        from simplex_tpu.config import kernel_blocked_eligible

        opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                            eps=1e-5, block_pivots=L)
        assert kernel_blocked_eligible(opt)   # eligible, but...
        p = generate_random_problem(64, 16, 3, 1, 100)
        got = solve(p, opt)                   # CPU: XLA loop either way
        want = solve_oracle(p)
        assert got.status == Status.OPTIMAL
        assert got.objective == pytest.approx(want.objective, rel=1e-4)

        with pytest.raises(AssertionError, match="multiple of 8"):
            Tt = _rand((16, 128), 0)
            C = jnp.zeros((L, 128), jnp.float32)
            F = jnp.zeros((L, 16), jnp.float32)
            chi, clo = ff32_from_f64(jnp.zeros(128))
            colk_costs_pass(Tt, C, F, chi, clo, jnp.int32(0),
                            jnp.int32(0), jnp.float32(0), jnp.float32(0),
                            r=128, eps=1e-6, interpret=True)


class TestDevex:
    """Devex pricing (pivot_rule='devex', Forrest-Goldfarb reference
    weights) through the XLA blocked loop and the fused kernel loop:
    fewer pivots than Dantzig, same optimum as the oracle."""

    def test_oracle_devex_fewer_pivots_same_optimum(self):
        p = generate_random_problem(256, 96, 5, 1, 100)
        a = solve_oracle(p)
        d = solve_oracle(p, SolverOptions(pivot_rule="devex"))
        assert a.status == d.status == Status.OPTIMAL
        assert d.objective == pytest.approx(a.objective, rel=1e-9)
        assert (d.iterations_phase1 + d.iterations_phase2
                < a.iterations_phase1 + a.iterations_phase2)

    def test_xla_blocked_devex_matches_oracle_walk(self):
        """f64 XLA blocked loop with devex: same pivot counts as the
        oracle's devex walk (both price on exact arithmetic with
        lowest-index ties) and the oracle optimum."""
        from simplex_tpu import solve

        p = generate_random_problem(96, 40, 5, 1, 100)
        want = solve_oracle(p, SolverOptions(pivot_rule="devex"))
        got = solve(p, SolverOptions(pivot_rule="devex", block_pivots=8))
        assert got.status == want.status == Status.OPTIMAL
        assert got.iterations_phase1 == want.iterations_phase1
        assert got.iterations_phase2 == want.iterations_phase2
        assert got.objective == pytest.approx(want.objective, rel=1e-9)

    def test_kernel_loop_devex_matches_oracle(self):
        """Fused kernel loop (interpret) with devex: oracle optimum and
        a pivot count in the devex regime (well under Dantzig's)."""
        from simplex_tpu.tableau import phase1_objective

        opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                            eps=1e-5, block_pivots=8,
                            pivot_rule="devex")
        n, m = 96, 24
        p = generate_random_problem(n, m, 11, 1, 100)
        dims = (round_up(n + 2 * m, 128), round_up(m, 128))
        tab = build_phase1(jnp.asarray(p.A), jnp.asarray(p.b), n, m, opt,
                           dims=dims)
        costs0 = tab.costs
        tab = gaussian_eliminate(tab)
        got_tab, got_status, got_iters = solve_loop_blocked_kernel(
            tab, opt, 2000, costs0, interpret=True)
        want_tab, want_status, want_iters = solve_loop_blocked(
            tab, opt, 2000, costs0)
        dant_tab, dant_status, dant_iters = solve_loop_blocked(
            tab, dataclasses.replace(opt, pivot_rule="dantzig"), 2000,
            costs0)
        assert int(got_status) == int(want_status) == int(Status.OPTIMAL)
        assert float(phase1_objective(got_tab)) > -1e-4
        # kernel and XLA devex agree closely; both beat Dantzig's count
        assert abs(int(got_iters) - int(want_iters)) <= max(
            3, int(want_iters) // 10)
        assert int(got_iters) < int(dant_iters)

    def test_devex_requires_blocked(self):
        from simplex_tpu import solve

        p = generate_random_problem(16, 8, 1, 1, 100)
        with pytest.raises(ValueError, match="devex"):
            solve(p, SolverOptions(pivot_rule="devex"))

    def test_weight_update_overflow_capped(self):
        """The in-kernel weight update must cap at 1e12 and never emit
        NaN even when alpha^2 * w_h overflows f32 (the 2048x256 sweep
        pathology: inf then inf*0=NaN poisoned the score argmax)."""
        m_pad, r_pad, L = 16, 256, 8
        Tt = _rand((m_pad, r_pad), 0) * 1e18   # huge colk values
        C = jnp.zeros((L, r_pad), jnp.float32)
        F = jnp.zeros((L, m_pad), jnp.float32)
        chi, clo = ff32_from_f64(jnp.zeros(r_pad))
        bf = (jnp.zeros((m_pad,), jnp.float32),          # ah
              jnp.zeros((m_pad,), jnp.float32),          # b hi
              jnp.zeros((m_pad,), jnp.float32),          # b lo
              jnp.zeros((m_pad,), jnp.int32),            # base
              jnp.int32(0), jnp.float32(1e-4),           # h, p (tiny)
              jnp.float32(0), jnp.float32(0))            # bk pair
        w = jnp.full((r_pad,), 1e8, jnp.float32)
        outs = colk_costs_pass(
            Tt, C, F, chi, clo, jnp.int32(3), jnp.int32(0),
            jnp.float32(0), jnp.float32(0), r=r_pad, eps=1e-6,
            do=jnp.asarray(True), bf=bf,
            devex=(w, jnp.float32(1e8), jnp.int32(5)), interpret=True)
        w2 = np.asarray(outs[13])
        assert np.isfinite(w2).all(), "NaN/inf leaked into the weights"
        assert w2.max() <= 1e12 + 1
