"""Degeneracy handling (north-star config 4): the reference only detects
an artificial variable stuck in the Phase-1 basis and aborts with
DEGENERATE (reference twoPhaseMethod.cu:270-282, relazione.Rmd:64-66);
this framework must also *resolve* such problems — pivot the zero-valued
artificials out (or drop redundant constraints) and continue to Phase 2
with Bland's-rule anti-cycling available."""

import numpy as np
import pytest

from simplex_tpu import Problem, Status, solve
from simplex_tpu.oracle import solve_oracle

from conftest import assert_valid_solution


def degenerate_redundant() -> Problem:
    """Duplicate constraint (row 2 = row 1) + a zero RHS row: Phase 1
    ends with an artificial basic at value 0."""
    A = np.array([
        [1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0],      # redundant duplicate
        [1.0, -1.0, 0.0],
    ])
    b = np.array([4.0, 4.0, 0.0])
    c = np.array([2.0, 3.0, 1.0])
    return Problem(A=A, b=b, c=c)


def degenerate_zero_rhs() -> Problem:
    """b = 0 rows force degenerate vertices (many zero-ratio ties)."""
    A = np.array([
        [1.0, 2.0],
        [2.0, 4.0],          # scalar multiple -> redundant
        [1.0, -1.0],
    ])
    b = np.array([6.0, 12.0, 0.0])
    c = np.array([1.0, 1.0])
    return Problem(A=A, b=b, c=c)


class TestEqualityViaDoubleInequality:
    """Ax <= b with an 'Ax >= b' pair is the canonical-form trick that
    routinely produces degenerate Phase-1 bases."""

    def problem(self):
        A = np.array([
            [1.0, 1.0],
            [-1.0, -1.0],     # together: x1 + x2 == 3
            [1.0, 0.0],
        ])
        b = np.array([3.0, -3.0, 2.0])
        c = np.array([1.0, 2.0])
        return Problem(A=A, b=b, c=c)

    def test_oracle(self):
        r = solve_oracle(self.problem())
        assert r.status == Status.OPTIMAL
        # max x1 + 2 x2 s.t. x1 + x2 == 3, x1 <= 2 -> x = (0, 3), obj 6.
        assert r.objective == pytest.approx(6.0, abs=1e-8)

    def test_device(self):
        r = solve(self.problem())
        assert r.status == Status.OPTIMAL
        assert r.objective == pytest.approx(6.0, abs=1e-8)
        assert_valid_solution(self.problem(), r)


@pytest.mark.parametrize("make", [degenerate_redundant, degenerate_zero_rhs])
def test_continue_policy_solves(make):
    p = make()
    want = solve_oracle(p)
    got = solve(p)
    assert want.status == Status.OPTIMAL
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-9)
    assert_valid_solution(p, got)


def test_reference_policy_reports_degenerate():
    p = degenerate_redundant()
    got = solve(p, degeneracy="reference")
    oracle = solve_oracle(p, tie_rule="lowest")
    if oracle.degenerate:
        assert got.status == Status.DEGENERATE
    else:
        # Tie-order-dependent: at minimum the continue path must agree.
        assert got.status in (Status.DEGENERATE, Status.OPTIMAL)


def test_blocked_mode_handles_degeneracy():
    for make in (degenerate_redundant, degenerate_zero_rhs):
        p = make()
        want = solve_oracle(p)
        got = solve(p, block_pivots=4)
        assert got.status == Status.OPTIMAL
        assert got.objective == pytest.approx(want.objective, rel=1e-8)


def test_bland_rule_terminates_on_cycling_prone():
    """Beale-style cycling-prone constraints (all-zero RHS rows, exact
    ratio ties everywhere); pure Dantzig can cycle on such bases — the
    stall-triggered Bland fallback must terminate. Optimum x = (1,0,1,0),
    objective 1.25 (verified feasible; oracle and device agree)."""
    A = np.array([
        [0.25, -8.0, -1.0, 9.0],
        [0.5, -12.0, -0.5, 3.0],
        [0.0, 0.0, 1.0, 0.0],
    ])
    b = np.array([0.0, 0.0, 1.0])
    c = np.array([0.75, -20.0, 0.5, -6.0])
    p = Problem(A=A, b=b, c=c)
    r = solve(p, bland_threshold=5)
    assert r.status == Status.OPTIMAL
    assert r.objective == pytest.approx(1.25, abs=1e-9)
    assert_valid_solution(p, r)
    ro = solve_oracle(p)
    assert ro.status == Status.OPTIMAL
    assert ro.objective == pytest.approx(1.25, abs=1e-9)


@pytest.mark.parametrize("field,bad", [
    ("A", np.inf), ("A", np.nan),
    ("b", np.inf), ("b", np.nan),
    ("c", np.inf), ("c", np.nan),
])
def test_numeric_guard_on_poisoned_input(field, bad):
    """Non-finite values in ANY input array must surface as
    Status.NUMERIC, not as a garbage OPTIMAL/INFEASIBLE verdict (the
    pre-flight reduction in two_phase.solve_device)."""
    A = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.array([4.0, 5.0])
    c = np.array([1.0, 1.0])
    arrays = {"A": A, "b": b, "c": c}
    arrays[field] = arrays[field].copy()
    arrays[field].reshape(-1)[-1] = bad
    r = solve(Problem(A=arrays["A"], b=arrays["b"], c=arrays["c"]))
    assert r.status == Status.NUMERIC
    assert r.x is None


class TestInfeasibilityKnifeEdge:
    """Oracle and device share the SAME infeasibility rule: phase-1
    objective recomputed from the final basis, thresholded at
    eps * (1 + max|b|). A knife-edge residual between eps and that scaled
    threshold is a degenerate zero on BOTH paths (the reference's
    absolute-eps reading of the running costs[0] would call it
    INFEASIBLE)."""

    def knife_edge(self, gap):
        # x0 >= 10 and x0 <= 10 - gap: infeasible by exactly `gap`;
        # the y <= 100 row sets the b-scale to 101.
        A = np.array([
            [-1.0, 0.0],
            [1.0, 0.0],
            [0.0, 1.0],
        ])
        b = np.array([-10.0, 10.0 - gap, 100.0])
        c = np.array([1.0, 0.0])
        return Problem(A=A, b=b, c=c)

    def test_knife_edge_residual_is_feasible_on_both(self):
        # gap = 5e-8: within eps * (1 + max|b|) = 1.01e-7 -> degenerate
        # zero, solved through to OPTIMAL by oracle AND device alike.
        p = self.knife_edge(5e-8)
        ro, rd = solve_oracle(p), solve(p)
        assert ro.status == Status.OPTIMAL
        assert rd.status == Status.OPTIMAL
        assert ro.objective == pytest.approx(10.0, abs=1e-6)
        assert rd.objective == pytest.approx(10.0, abs=1e-6)

    def test_clear_infeasibility_on_both(self):
        p = self.knife_edge(1e-4)
        ro, rd = solve_oracle(p), solve(p)
        assert ro.status == Status.INFEASIBLE
        assert rd.status == Status.INFEASIBLE
        # Both report the recomputed phase-1 objective (-gap).
        assert ro.objective == pytest.approx(rd.objective, rel=1e-6)
        assert ro.objective == pytest.approx(-1e-4, rel=1e-3)
