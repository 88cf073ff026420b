"""Warm-start f64 finishing from a near-optimal basis (finish.py).

The tier between "refinement certified" and "full f64 re-solve": the
r5 sweep found 3 sizes whose 10-24k-pivot mixed walks drifted to a
measurably suboptimal basis (dual_inf 2.6e-2..3.3); warm finishing
rebuilds the exact f64 tableau for that basis and lets the oracle's
own loop walk the few remaining pivots.
"""

import numpy as np
import pytest

from simplex_tpu import (SolverOptions, Status, generate_random_problem,
                         solve, solve_oracle)
from simplex_tpu.finish import finish_from_basis
from simplex_tpu.oracle import _build_phase1, _gaussian_eliminate, \
    _solve_loop


def _suboptimal_feasible_basis(p, stop_short: int):
    """A PRIMAL-FEASIBLE but suboptimal basis: run the oracle's own f64
    two-phase walk but cap phase 2 ``stop_short`` pivots early."""
    n, m = p.vars, p.constraints
    opts = SolverOptions()
    t = _build_phase1(p, 1e-9)
    _gaussian_eliminate(t)
    st, it1 = _solve_loop(t, np.ones(n + 2 * m, bool), opts, 100000)
    assert st == Status.OPTIMAL
    from simplex_tpu.oracle import _Tableau

    t2 = _Tableau(t.T[:n + m], t.b,
                  np.concatenate([-p.c.astype(np.float64), np.zeros(m)]),
                  t.z, t.base)
    _gaussian_eliminate(t2)
    full = solve_oracle(p)
    cap = max(full.iterations_phase2 - stop_short, 0)
    _solve_loop(t2, np.ones(n + m, bool), opts, cap)
    return t2.base.copy()


class TestFinishFromBasis:
    def test_zero_pivots_from_optimal_basis(self):
        p = generate_random_problem(80, 32, 7, 1, 100)
        want = solve_oracle(p)
        base = _suboptimal_feasible_basis(p, stop_short=0)
        r = finish_from_basis(p, base, SolverOptions())
        assert r is not None and r.status == Status.OPTIMAL
        assert r.iterations_phase2 == 0
        assert r.objective == pytest.approx(want.objective, rel=1e-12)

    @pytest.mark.parametrize("short", [1, 3, 8])
    def test_finishes_suboptimal_basis(self, short):
        p = generate_random_problem(120, 48, 11, 1, 100)
        want = solve_oracle(p)
        base = _suboptimal_feasible_basis(p, stop_short=short)
        r = finish_from_basis(p, base, SolverOptions())
        assert r is not None and r.status == Status.OPTIMAL
        assert 0 < r.iterations_phase2 <= 3 * short + 5
        assert r.objective == pytest.approx(want.objective, rel=1e-12)
        np.testing.assert_allclose(r.x, want.x, atol=1e-9)

    def test_singular_basis_returns_none(self):
        p = generate_random_problem(40, 16, 5, 1, 100)
        base = np.zeros(16, np.int64)       # variable 0 sixteen times
        assert finish_from_basis(p, base, SolverOptions()) is None

    def test_negative_rhs_rows(self):
        from simplex_tpu.problem import Problem

        p = Problem(A=np.array([[-1.0, -1.0], [1.0, 2.0]]),
                    b=np.array([-1.0, 10.0]), c=np.array([1.0, 1.0]))
        want = solve_oracle(p)
        base = _suboptimal_feasible_basis(p, stop_short=1)
        r = finish_from_basis(p, base, SolverOptions())
        assert r is not None and r.status == Status.OPTIMAL
        assert r.objective == pytest.approx(want.objective, rel=1e-12)


class TestFallbackUsesWarmFinish:
    def test_forced_fallback_lands_on_oracle(self, monkeypatch):
        """With the device restart tier knocked out, refine_tol=1e-300
        forces certificate failure; the fallback must produce the
        oracle objective — through the warm finisher (near-instant
        here) or the full re-solve, indistinguishable in result, both
        exact."""
        import simplex_tpu.reinvert as reinvert

        def boom(*a, **k):
            raise RuntimeError("simulated RESOURCE_EXHAUSTED")

        monkeypatch.setattr(reinvert, "restart_device", boom)
        p = generate_random_problem(100, 40, 5, 1, 100)
        r = solve(p, SolverOptions(dtype=np.float32,
                                   vector_dtype=np.float64,
                                   block_pivots=16, refine_tol=1e-300))
        want = solve_oracle(p)
        assert r.status == Status.OPTIMAL
        assert r.refine is not None and r.refine.fallback
        assert r.objective == pytest.approx(want.objective, rel=1e-12)

    def test_warm_finish_directly_from_mixed_basis(self):
        """The production scenario end-to-end: mixed solve's final
        basis -> warm finish -> oracle optimum."""
        import jax.numpy as jnp

        from simplex_tpu.two_phase import solve_device

        p = generate_random_problem(150, 60, 21, 1, 100)
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=16, refine=False)
        out = solve_device(jnp.asarray(p.A), jnp.asarray(p.b),
                           jnp.asarray(p.c), p.vars, p.constraints, opts)
        assert int(out.status) == int(Status.OPTIMAL)
        r = finish_from_basis(p, np.asarray(out.base), opts)
        want = solve_oracle(p)
        assert r is not None and r.status == Status.OPTIMAL
        assert r.objective == pytest.approx(want.objective, rel=1e-12)
