"""Power-of-two equilibration (scaling.py) for extreme-magnitude LPs.

VERDICT r4 next #7: coefficient ranges around 1e±30 overflow the mixed
mode's double-f32 pair vectors (NUMERIC abort today); with
``equilibrate=True`` they must solve OPTIMAL in mixed mode with correct
UNSCALED objectives, while knife-edge infeasibility semantics
(reference eps contract, macro.h:28-42) survive the scaling.
"""

import numpy as np
import pytest

from simplex_tpu import (Problem, SolverOptions, Status,
                         generate_random_problem, solve, solve_oracle)
from simplex_tpu.scaling import Scaling, equilibrate, unwind_result

MIXED = dict(dtype=np.float32, vector_dtype=np.float64, block_pivots=16)


def _extreme_problem(seed: int, exp=15):
    """(base, extreme): a seeded OPTIMAL instance and its row/column
    10^±15-scaled counterpart (A entries span ~1e±30). Row scaling
    preserves the feasible set and column scaling is the substitution
    x = s * x', so the extreme problem's optimum VALUE equals the
    base's — the ground truth the f64 oracle can certify at sane
    magnitudes (its absolute-eps discipline misjudges the extreme
    instance directly)."""
    p = generate_random_problem(60, 24, seed, 1, 100)
    rng = np.random.default_rng(seed)
    rexp = rng.integers(-exp, exp + 1, size=p.constraints)
    cexp = rng.integers(-exp, exp + 1, size=p.vars)
    A = p.A * (10.0 ** rexp)[:, None] * (10.0 ** cexp)[None, :]
    b = p.b * (10.0 ** rexp)
    c = p.c * (10.0 ** cexp)
    return p, Problem(A=A, b=b, c=c)


class TestEquilibrate:
    def test_factors_are_powers_of_two(self):
        _, p = _extreme_problem(3)
        sp, sc = equilibrate(p)
        for f in (sc.row, sc.col):
            m, e = np.frexp(f)
            assert np.all(m == 0.5), "not a power of two"
        # scaled magnitudes land in a sane band
        mags = np.abs(sp.A[sp.A != 0])
        assert mags.max() < 1e8 and mags.min() > 1e-8

    def test_scaling_is_exact(self):
        """Power-of-two factors add no rounding: unscaling reproduces
        the original coefficients bit-for-bit."""
        _, p = _extreme_problem(5)
        sp, sc = equilibrate(p)
        back = sp.A / sc.row[:, None] / sc.col[None, :]
        assert np.array_equal(back, p.A)

    def test_unwind_identity_without_refine(self):
        p = generate_random_problem(40, 16, 9, 1, 100)
        sp, sc = equilibrate(p)
        r = solve(sp, SolverOptions())          # solve the scaled LP, f64
        assert r.status == Status.OPTIMAL
        un = unwind_result(r, sc, p)
        ro = solve_oracle(p)
        assert un.objective == pytest.approx(ro.objective, rel=1e-9)


class TestSolveEquilibrated:
    @pytest.mark.parametrize("seed", [1, 2, 7])
    def test_extreme_range_mixed_optimal(self, seed):
        """1e±30 coefficient ranges: equilibrated mixed solves OPTIMAL
        with the base instance's optimum (the exact-substitution ground
        truth), certified by refinement against the extreme problem's
        own f64 data."""
        base, p = _extreme_problem(seed)
        ro = solve_oracle(base)
        assert ro.status == Status.OPTIMAL
        r = solve(p, SolverOptions(**MIXED, equilibrate=True))
        assert r.status == Status.OPTIMAL
        assert r.refine is not None and r.refine.certified
        assert not r.refine.fallback
        assert r.objective == pytest.approx(ro.objective, rel=1e-9)

    def test_f64_equilibrated_matches_plain(self):
        """In f64 the scaled walk may differ, but the optimum agrees."""
        p = generate_random_problem(80, 32, 11, 1, 100)
        a = solve(p)
        b = solve(p, equilibrate=True)
        assert a.status == b.status == Status.OPTIMAL
        assert b.objective == pytest.approx(a.objective, rel=1e-9)

    def test_infeasible_semantics_survive_scaling(self, infeasible_problem):
        r = solve(infeasible_problem,
                  SolverOptions(**MIXED, equilibrate=True))
        assert r.status == Status.INFEASIBLE

    def test_knife_edge_infeasibility(self):
        """A scaled-up infeasible system (x <= 1e20 and -x <= -2e20)
        stays INFEASIBLE under equilibration in mixed mode — the eps
        contract applies in the scaled units, where the gap is O(1)."""
        p = Problem(A=np.array([[1.0], [-1.0]]),
                    b=np.array([1e20, -2e20]),
                    c=np.array([1.0]))
        r = solve(p, SolverOptions(**MIXED, equilibrate=True))
        assert r.status == Status.INFEASIBLE

    def test_beyond_f32_range_refines_in_scaled_space(self):
        """|A| entries past f32's ~3.4e38 max: the original-unit LU
        preconditioner would overflow outright, so refinement MUST run
        in scaled space (r5 review fix) — certified, no fallback."""
        base, _ = _extreme_problem(2)
        rexp = np.linspace(-20, 20, base.constraints)
        cexp = np.linspace(20, -20, base.vars)
        A = base.A * (10.0 ** rexp)[:, None] * (10.0 ** cexp)[None, :]
        assert np.abs(A).max() > 1e38          # f32-unrepresentable
        p = Problem(A=A, b=base.b * (10.0 ** rexp),
                    c=base.c * (10.0 ** cexp))
        ro = solve_oracle(base)
        r = solve(p, SolverOptions(**MIXED, equilibrate=True))
        assert r.status == Status.OPTIMAL
        assert r.refine is not None and r.refine.certified
        assert not r.refine.fallback
        assert r.objective == pytest.approx(ro.objective, rel=1e-9)

    def test_unbounded_survives_scaling(self):
        p = Problem(A=np.array([[1e25, -1e25]]), b=np.array([1e20]),
                    c=np.array([1e-20, 1.0]))
        r = solve(p, SolverOptions(**MIXED, equilibrate=True))
        assert r.status == Status.UNBOUNDED
