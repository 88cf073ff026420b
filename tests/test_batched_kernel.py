"""Batched fused-kernel path (kernels/batched.py + the batch.py kernel
driver) on the CPU via interpret mode.

The production target is TPU (batch.batch_kernel_enabled requires the
tpu backend); these tests force the path with kernel='interpret' and
check it against the NumPy oracle, the vmapped-XLA fallback, and the
status contract across the full case spread (optimal / unbounded /
infeasible / degenerate / NUMERIC / MAXITER).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from simplex_tpu.batch import (batch_kernel_dims, solve_batched,
                               solve_device_batched)
from simplex_tpu.config import SolverOptions, Status
from simplex_tpu.generator import generate_random_problem
from simplex_tpu.oracle import solve_oracle
from simplex_tpu.problem import Problem

#: Production-shaped options (mixed precision, blocked) at a toy window.
OPT = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                    block_pivots=8, eps=1e-5)


def _random_batch(n, m, seeds):
    return [generate_random_problem(n, m, s, 1, 100) for s in seeds]


def _stack(problems):
    A = jnp.asarray(np.stack([p.A for p in problems]))
    b = jnp.asarray(np.stack([p.b for p in problems]))
    c = jnp.asarray(np.stack([p.c for p in problems]))
    return A, b, c


class TestAgainstOracle:
    def test_random_lanes_match_oracle(self):
        problems = _random_batch(24, 10, seeds=(1, 2, 3, 4))
        results = solve_batched(problems, OPT, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve_oracle(p)
            assert r.status == want.status, (r.status, want.status)
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 5e-4, (r.objective, want.objective)

    def test_wide_lanes_match_oracle(self):
        # More variables than constraints (the reference's benchmark
        # regime) and enough pivots for several L=8 windows + re-prices.
        problems = _random_batch(60, 12, seeds=(7, 8))
        results = solve_batched(problems, OPT, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve_oracle(p)
            assert r.status == want.status
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 5e-4

    def test_matches_vmap_fallback(self):
        problems = _random_batch(24, 10, seeds=(11, 12, 13))
        kern = solve_batched(problems, OPT, kernel="interpret")
        xla = solve_batched(problems, OPT, kernel=False)
        for a, b in zip(kern, xla):
            assert a.status == b.status
            rel = abs(a.objective - b.objective) / (1 + abs(b.objective))
            assert rel < 5e-4


class TestCaseSpread:
    def _spread(self):
        # Homogeneous (n=2, m=2) batch covering the status spread.
        feasible = Problem(
            A=np.array([[1.0, 0.0], [0.0, 1.0]]),
            b=np.array([1.0, 2.0]), c=np.array([3.0, 5.0]))
        unbounded = Problem(
            A=np.array([[1.0, 0.0], [1.0, 0.0]]),
            b=np.array([1.0, 2.0]), c=np.array([1.0, 1.0]))
        infeasible = Problem(
            A=np.array([[-1.0, 0.0], [1.0, 0.0]]),
            b=np.array([-1.0, 0.5]), c=np.array([1.0, 0.0]))
        return [feasible, unbounded, infeasible]

    def test_statuses(self):
        results = solve_batched(self._spread(), OPT, kernel="interpret")
        assert results[0].status == Status.OPTIMAL
        assert abs(results[0].objective - 13.0) < 1e-3
        assert results[1].status == Status.UNBOUNDED
        assert results[2].status == Status.INFEASIBLE

    def test_degenerate_lanes_match_single_chip(self):
        # The canonical degenerate fixtures (redundant duplicate row +
        # zero-RHS row; an equality via a <=/>= pair): the batched kernel
        # must reproduce the single-chip solve's full contract — status,
        # objective AND the degenerate flag (whether phase 1 left an
        # artificial basic is tie-order dependent, so the single-chip
        # path under the same options is the truth, not a constant).
        from simplex_tpu.two_phase import solve

        lanes = [
            Problem(A=np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0],
                                [1.0, -1.0, 0.0]]),
                    b=np.array([4.0, 4.0, 0.0]),
                    c=np.array([2.0, 3.0, 1.0])),
            Problem(A=np.array([[1.0, 1.0, 0.0], [-1.0, -1.0, 0.0],
                                [1.0, 0.0, 0.0]]),
                    b=np.array([3.0, -3.0, 2.0]),
                    c=np.array([1.0, 2.0, 0.0])),
        ]
        results = solve_batched(lanes, OPT, kernel="interpret")
        for p, r in zip(lanes, results):
            want = solve(p, OPT)
            assert r.status == want.status
            assert r.degenerate == want.degenerate
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 5e-4

    def test_numeric_lane_is_isolated(self):
        problems = _random_batch(24, 10, seeds=(21, 22))
        A, b, c = _stack(problems)
        A = A.at[1, 0, 0].set(jnp.nan)
        out = solve_device_batched(A, b, c, 24, 10, OPT,
                                   kernel="interpret")
        assert int(out.status[0]) == int(Status.OPTIMAL)
        assert int(out.status[1]) == int(Status.NUMERIC)

    def test_maxiter_freezes_lane(self):
        problems = _random_batch(24, 10, seeds=(31, 32))
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=8, eps=1e-5, max_iter=1)
        results = solve_batched(problems, opts, kernel="interpret")
        assert all(r.status == Status.MAXITER for r in results)

    def test_heterogeneous_finish_times(self):
        # A lane that is optimal with zero phase-2 pivots (c <= 0) rides
        # idle while a busy lane keeps pivoting; both must come out right.
        trivial = Problem(
            A=np.array([[1.0] * 24] * 10),
            b=np.full(10, 5.0), c=np.full(24, -1.0))
        busy = _random_batch(24, 10, seeds=(41,))[0]
        results = solve_batched([trivial, busy], OPT, kernel="interpret")
        assert results[0].status == Status.OPTIMAL
        assert abs(results[0].objective) < 1e-6
        want = solve_oracle(busy)
        assert results[1].status == want.status
        rel = abs(results[1].objective - want.objective) / (
            1 + abs(want.objective))
        assert rel < 5e-4


class TestEpsRepresentation:
    """ADVICE r3 (medium): the premature-optimal reopen test must use
    the kernel's pair-exact eligibility arithmetic, not an f64-view
    threshold — for ~half of user-settable eps values f32(eps) > eps
    makes the kernel strictly stricter, and a reduced cost between the
    two thresholds spins a zero-pivot reopen cycle into a false
    MAXITER."""

    def test_pair_eligible_knife_edge(self):
        from simplex_tpu.kernels.batched import pair_eligible
        from simplex_tpu.kernels.blocked import ff32_from_f64

        # eps values in BOTH rounding halves: f32(eps) > eps (kernel
        # stricter under the old view test) and f32(eps) < eps.
        eps_up = float(np.nextafter(float(np.float32(1.1e-5)), 0.0))
        eps_dn = 1e-5
        for eps in (eps_up, eps_dn):
            eps32 = np.float32(eps)
            # Costs straddling BOTH thresholds, incl. exact knife edges.
            xs = np.array([-2 * eps, -float(eps32) * (1 + 1e-7),
                           -float(eps32), -float(eps32) * (1 - 1e-7),
                           -eps, -eps * (1 - 1e-7), -eps / 2, 0.0, eps])
            chi, clo = ff32_from_f64(jnp.asarray(xs))
            got = np.asarray(pair_eligible(chi, clo, jnp.float32(eps)))
            # The kernel's contract: eligible iff the PAIR satisfies
            # x + f32(eps) <= 0 exactly (pair-exact two_sum; the pair
            # here is an exact f64 round-trip, so the reference is f64
            # arithmetic against the f32-rounded eps).
            want = xs + float(eps32) <= 0
            np.testing.assert_array_equal(got, want, err_msg=str(eps))

    def test_stricter_kernel_eps_terminates(self):
        # eps chosen so f32(eps) > eps — under the old f64-view reopen
        # threshold this is the half where a knife-edge cost spins the
        # zero-pivot reopen cycle; with the shared pair_eligible test
        # the batch must terminate cleanly whatever the costs.
        eps = float(np.nextafter(float(np.float32(1.1e-5)), 0.0))
        assert float(np.float32(eps)) > eps
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=8, eps=eps)
        problems = _random_batch(24, 10, seeds=(51, 52, 53))
        results = solve_batched(problems, opts, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve_oracle(p)
            assert r.status == want.status == Status.OPTIMAL
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 5e-4


class TestIterationFuse:
    def test_fuse_is_pivot_exact(self):
        """ADVICE r3 (low): the per-lane iteration fuse gates every
        in-window pivot, so a lane stops at EXACTLY max_iter pivots —
        matching the vmapped-XLA fallback — instead of overrunning up
        to L-1 pivots inside its final window."""
        problems = _random_batch(24, 10, seeds=(61, 62))
        for cap in (1, 3, 11):
            opts = SolverOptions(dtype=np.float32,
                                 vector_dtype=np.float64,
                                 block_pivots=8, eps=1e-5, max_iter=cap)
            kern = solve_batched(problems, opts, kernel="interpret")
            xla = solve_batched(problems, opts, kernel=False)
            for a, b in zip(kern, xla):
                assert a.status == b.status == Status.MAXITER
                assert a.iterations_phase1 == b.iterations_phase1 == cap
                assert a.iterations_phase2 == b.iterations_phase2


class TestMultiTileWalk:
    """VERDICT r3 #2: the kernel's dynamic addressing — the 128-aligned
    entering strip (h >= 128), the k8/t8 sublane slabs (k >= 8, t >= 8),
    multi-window eta reuse — must be exercised at shapes with MULTIPLE
    128-lane tiles and 8-row slabs, with the pivot WALK asserted against
    the single-chip blocked loop, not just the final objective.

    Shape n=300, m=140, L=16 -> r_pad=640 (5 lane tiles), m_pad=256:
    ~230 phase-1 pivots span ~15 windows, entering columns routinely sit
    at h in [128, 580), leaving rows at k in [8, 140), eta slots at
    t in [8, 16). A strip- or slab-offset bug scrambles the walk within
    a window and cannot survive the exact-count or sequence assertions.
    """

    def test_multitile_counts_match_single_chip_exactly(self):
        # Seeds where the full two-phase pivot counts match the
        # single-chip blocked loop EXACTLY (the standard the sharded
        # suite meets, tests/test_sharded_kernel.py). Phase-1 counts
        # match on every seed scanned (12/12); phase-2 tails can
        # legitimately differ by a few knife-edge pivots at the optimum
        # (see test_multitile_phase2_tail_envelope), so the exact pins
        # use seeds where they do not.
        from simplex_tpu.two_phase import solve

        # dantzig pinned: exact cross-implementation walk equality is a
        # Dantzig artifact (devex near-tie scores are f32-representation
        # sensitive; the default now resolves devex for this config).
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             eps=1e-5, block_pivots=16,
                             pivot_rule="dantzig")
        problems = _random_batch(300, 140, seeds=(1, 3, 4, 5))
        results = solve_batched(problems, opts, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve(p, opts)
            assert r.status == want.status == Status.OPTIMAL
            assert r.iterations_phase1 == want.iterations_phase1
            assert r.iterations_phase2 == want.iterations_phase2
            assert r.iterations_phase1 >= 200   # many windows deep
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 1e-4

    def test_multitile_phase2_tail_envelope(self):
        """Seeds whose phase-2 tails differ: phase-1 counts still match
        EXACTLY, phase 2 by at most a few pivots. The divergence is
        measured and understood: both paths' f32 tableaus differ in
        last-ulp summation order (XLA dots vs kernel pair arithmetic),
        so a repriced reduced cost landing within ~1e-6 of -eps can be
        eligible in one state and not the other; each extra eligible
        column at the optimum admits one more near-zero-improvement
        pivot. One-sided (kernel >= single-chip): extra pair-f32 noise
        can only ADD false-eligible knife-edge columns, never remove a
        truly improving one. Status/objective are unaffected."""
        from simplex_tpu.two_phase import solve

        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             eps=1e-5, block_pivots=16)
        problems = _random_batch(300, 140, seeds=(2, 6, 7))
        results = solve_batched(problems, opts, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve(p, opts)
            assert r.status == want.status == Status.OPTIMAL
            assert r.iterations_phase1 == want.iterations_phase1
            assert abs(r.iterations_phase2 - want.iterations_phase2) <= 5
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 1e-4

    @pytest.mark.slow
    def test_multitile_pivot_sequence_equality(self):
        """The strongest walk assertion, knife-edge-free: run the
        batched kernel loop and the single-chip XLA blocked loop from
        the IDENTICAL phase-1 state under shared iteration caps and
        assert the full basis arrays are EQUAL at every cap — pivot-for-
        pivot sequence equality deep into multi-tile territory, at L=32
        (eta slots t up to 31, two 16-row C slabs per window)."""
        import dataclasses

        import jax
        from simplex_tpu.batch import run_solve_loop_batched
        from simplex_tpu.solver import run_solve_loop
        from simplex_tpu.tableau import build_phase1, gaussian_eliminate

        n, m, L = 320, 150, 32
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             eps=1e-5, block_pivots=L)
        R1, _, M = batch_kernel_dims(n, m, opts)
        assert R1 >= 512 and M >= 256, (R1, M)
        problems = _random_batch(n, m, seeds=(3,))
        A, b, _ = _stack(problems)
        tabs = jax.vmap(
            lambda Ai, bi: build_phase1(Ai.astype(jnp.float32), bi, n, m,
                                        opts, dims=(R1, M)))(A, b)
        costs0 = tabs.costs
        tabs = jax.vmap(gaussian_eliminate)(tabs)
        tab = dataclasses.replace(
            tabs, T=tabs.T[0], b=tabs.b[0], costs=tabs.costs[0],
            z=tabs.z[0], base=tabs.base[0])

        for cap in (48, 170):
            kt, ks, ki = run_solve_loop_batched(tabs, opts, cap, costs0,
                                                interpret=True)
            st, ss, si = run_solve_loop(tab, opts, cap, costs0[0])
            assert int(ki[0]) == int(si) == cap
            assert int(ks[0]) == int(ss) == int(Status.RUNNING)
            np.testing.assert_array_equal(np.asarray(kt.base[0]),
                                          np.asarray(st.base))
            rel = abs(float(kt.z[0]) - float(st.z)) / (
                1 + abs(float(st.z)))
            assert rel < 1e-5


class TestDevexKernel:
    """VERDICT r3 #5: devex pricing IN the batched kernel — per-lane
    Forrest-Goldfarb weights updated from the colk row each pivot
    already computes, score-based candidate selection, window-boundary
    re-anchor in the glue (the single-chip fused-kernel loop's exact
    scheme, kernels/blocked.py colk_costs_pass devex stage)."""

    DEVEX = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                          block_pivots=16, eps=1e-5, pivot_rule="devex")

    def test_multitile_devex_matches_oracle_and_single_chip(self):
        from simplex_tpu.two_phase import solve

        problems = _random_batch(300, 140, seeds=(1, 2, 3, 4))
        results = solve_batched(problems, self.DEVEX, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve_oracle(p, self.DEVEX)
            single = solve(p, self.DEVEX)
            assert r.status == want.status == single.status \
                == Status.OPTIMAL
            # Phase-1 pivot walks match the single-chip devex loop
            # EXACTLY (measured 4/4 seeds; the devex score is the same
            # f32 hi-part cost^2/w arithmetic as the single-chip fused
            # kernel); phase-2 tails carry the same few-knife-edge-pivot
            # envelope as Dantzig (see TestMultiTileWalk).
            assert r.iterations_phase1 == single.iterations_phase1
            assert abs(r.iterations_phase2 - single.iterations_phase2) \
                <= 5
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 1e-4

    def test_devex_reduces_pivots(self):
        # The point of devex: materially fewer pivots than Dantzig on
        # the same instances (35-45% at scale; ~30% at this size).
        dantzig = SolverOptions(dtype=np.float32,
                                vector_dtype=np.float64,
                                block_pivots=16, eps=1e-5,
                                pivot_rule="dantzig")
        problems = _random_batch(300, 140, seeds=(1, 2))
        dev = solve_batched(problems, self.DEVEX, kernel="interpret")
        dan = solve_batched(problems, dantzig, kernel="interpret")
        for a, b in zip(dev, dan):
            assert a.status == b.status == Status.OPTIMAL
            tot_dev = a.iterations_phase1 + a.iterations_phase2
            tot_dan = b.iterations_phase1 + b.iterations_phase2
            assert tot_dev < 0.85 * tot_dan, (tot_dev, tot_dan)

    def test_devex_degenerate_and_spread_lanes(self):
        # The status spread must hold under devex too (weights never
        # touch the optimality/unboundedness decisions).
        lanes = [
            Problem(A=np.array([[1.0, 0.0], [0.0, 1.0]]),
                    b=np.array([1.0, 2.0]), c=np.array([3.0, 5.0])),
            Problem(A=np.array([[1.0, 0.0], [1.0, 0.0]]),
                    b=np.array([1.0, 2.0]), c=np.array([1.0, 1.0])),
            Problem(A=np.array([[-1.0, 0.0], [1.0, 0.0]]),
                    b=np.array([-1.0, 0.5]), c=np.array([1.0, 0.0])),
        ]
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=8, eps=1e-5,
                             pivot_rule="devex")
        results = solve_batched(lanes, opts, kernel="interpret")
        assert results[0].status == Status.OPTIMAL
        assert abs(results[0].objective - 13.0) < 1e-3
        assert results[1].status == Status.UNBOUNDED
        assert results[2].status == Status.INFEASIBLE


class TestRepriceKernel:
    def test_pair_matvec_matches_f64(self):
        from simplex_tpu.kernels.batched import batch_reprice_pass
        from simplex_tpu.kernels.blocked import ff32_from_f64

        rng = np.random.default_rng(0)
        B, m_pad, r_pad = 3, 16, 256
        Tt = rng.uniform(-50, 50, (B, m_pad, r_pad)).astype(np.float32)
        coeffs = rng.uniform(-3, 3, (B, m_pad))
        c_hi, c_lo = ff32_from_f64(jnp.asarray(coeffs))
        flags = jnp.asarray([1, 0, 1], jnp.int32)
        hi, lo = batch_reprice_pass(
            jnp.asarray(Tt.reshape(B * m_pad, r_pad)),
            jnp.asarray(c_hi).reshape(B * m_pad, 1),
            jnp.asarray(c_lo).reshape(B * m_pad, 1),
            flags, interpret=True)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        want = np.einsum("bm,bmr->br", coeffs, Tt.astype(np.float64))
        # Interpret mode (XLA:CPU) contracts the Dekker product into an
        # FMA, degrading the pair bound to ~2^-25 relative — same
        # documented level as test_blocked_kernel's reprice tests; the
        # tight pair bound holds on real silicon (Mosaic does not
        # contract).
        scale = np.max(np.abs(want)) + 1.0
        np.testing.assert_allclose(got[0], want[0], atol=1e-7 * scale)
        np.testing.assert_allclose(got[2], want[2], atol=1e-7 * scale)
        assert (got[1] == 0).all()   # skipped lane emits zeros


class TestShardedFleet:
    """solve_batched(mesh=...) with the kernel path: the in-VMEM
    fused-kernel core runs PER SHARD under shard_map (r4 — previously a
    mesh forced the vmapped-XLA fallback). Pure data parallelism: the
    per-lane arithmetic is identical to the unsharded kernel path, so
    results must match it exactly, not just the oracle."""

    def test_fleet_matches_unsharded_kernel_exactly(self):
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
        problems = _random_batch(60, 12, seeds=(1, 2, 3, 4, 5, 6, 7, 8))
        fleet = solve_batched(problems, OPT, mesh=mesh,
                              kernel="interpret")
        solo = solve_batched(problems, OPT, kernel="interpret")
        for a, b in zip(fleet, solo):
            assert a.status == b.status
            assert a.iterations_phase1 == b.iterations_phase1
            assert a.iterations_phase2 == b.iterations_phase2
            assert a.objective == b.objective   # identical arithmetic
        for p, a in zip(problems, fleet):
            want = solve_oracle(p)
            assert a.status == want.status
            rel = abs(a.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 5e-4

    def test_fleet_devex_and_status_spread(self):
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:2]), ("batch",))
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=8, eps=1e-5,
                             pivot_rule="devex")
        lanes = [
            Problem(A=np.array([[1.0, 0.0], [0.0, 1.0]]),
                    b=np.array([1.0, 2.0]), c=np.array([3.0, 5.0])),
            Problem(A=np.array([[1.0, 0.0], [1.0, 0.0]]),
                    b=np.array([1.0, 2.0]), c=np.array([1.0, 1.0])),
        ]
        results = solve_batched(lanes, opts, mesh=mesh,
                                kernel="interpret")
        assert results[0].status == Status.OPTIMAL
        assert abs(results[0].objective - 13.0) < 1e-3
        assert results[1].status == Status.UNBOUNDED

    def test_fleet_solver_is_cached(self):
        # jax.jit caches on function identity: a fresh shard_map wrapper
        # per call would recompile the full two-phase program every
        # invocation (minutes at production shapes).
        import jax
        from jax.sharding import Mesh
        from simplex_tpu.batch import _fleet_solver

        mesh = Mesh(np.array(jax.devices()[:2]), ("batch",))
        assert (_fleet_solver(24, 10, mesh, OPT, True)
                is _fleet_solver(24, 10, mesh, OPT, True))

    def test_fleet_indivisible_batch_raises(self):
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
        problems = _random_batch(24, 10, seeds=(1, 2, 3))
        with pytest.raises(ValueError, match="divide"):
            solve_batched(problems, OPT, mesh=mesh, kernel="interpret")


class TestDispatch:
    def test_auto_is_off_on_cpu(self):
        from simplex_tpu.batch import batch_kernel_enabled

        assert not batch_kernel_enabled(OPT, 24, 10)

    def test_devex_runs_on_kernel_path(self, monkeypatch):
        # r4: devex moved IN-KERNEL (per-lane weights); the kernel path
        # accepts all three pricing rules. Check the auto gate passes
        # devex when the backend reports tpu.
        import simplex_tpu.batch as batch_mod

        monkeypatch.setattr("jax.default_backend", lambda: "tpu")
        devex = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                              block_pivots=8, eps=1e-5,
                              pivot_rule="devex")
        assert batch_mod.batch_kernel_enabled(devex, 24, 10)

    def test_batch_block_pivots_override(self):
        # The tuning knob overrides the L=32 clamp; results must stay
        # correct (same walk economy, different window partitioning).
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=128, eps=1e-5,
                             batch_block_pivots=16)
        problems = _random_batch(24, 10, seeds=(1, 2))
        results = solve_batched(problems, opts, kernel="interpret")
        for p, r in zip(problems, results):
            want = solve_oracle(p)
            assert r.status == want.status == Status.OPTIMAL
            rel = abs(r.objective - want.objective) / (
                1 + abs(want.objective))
            assert rel < 5e-4
        with pytest.raises(ValueError, match="multiple of 8"):
            SolverOptions(batch_block_pivots=12)
        with pytest.raises(ValueError, match="multiple of 8"):
            SolverOptions(batch_block_pivots=256)   # VMEM/accuracy cap

    def test_batch_block_pivots_satisfies_auto_gate(self, monkeypatch):
        # An explicit override IS the in-kernel L; the auto gate must not
        # reject it because block_pivots itself is unaligned (review r4).
        import simplex_tpu.batch as batch_mod

        monkeypatch.setattr("jax.default_backend", lambda: "tpu")
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=20, eps=1e-5,
                             batch_block_pivots=32)
        assert batch_mod.batch_kernel_enabled(opts, 24, 10)

    def test_vmem_gate(self):
        from simplex_tpu.kernels.batched import batch_kernel_fits

        R1, _, M = batch_kernel_dims(2000, 500, OPT)
        assert batch_kernel_fits(M, R1)          # config-3 shape fits
        assert not batch_kernel_fits(10112, 100096)   # flagship does not
