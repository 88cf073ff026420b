"""The per-operation timed driver (timed.solve_timed) — the -D TIMER
build of the reference (twoPhaseMethod.cu:225-435 + chrono.cu).

Covers both timing modes (aggregate per-phase rows vs the reference's
one-``solve``-row-per-pivot behaviour, solver.cu:84-123), the Chrono CSV
schema (``vars,contraints,operation,elapsed_time``, chrono.cu:29 — the
reference's header typo is reproduced verbatim), and result parity with
the fused two_phase.solve path on golden/degenerate/infeasible inputs.
"""

import glob
import os

import numpy as np
import pytest

from simplex_tpu import Problem, Status, read_problem, solve
from simplex_tpu.chrono import Chrono
from simplex_tpu.timed import solve_timed

from conftest import DATA

# The op sequence the reference times (twoPhaseMethod.cu:230-425).
TIMED_OPS = ("fillTableau", "gauss1", "solve", "checkDegeneracy",
             "costsVector", "gauss2", "solution")


def read_csv(data_dir):
    path = sorted(glob.glob(os.path.join(data_dir, "times_*.txt")))[-1]
    rows = open(path).read().strip().splitlines()
    assert rows[0] == "vars,contraints,operation,elapsed_time"
    return [r.split(",") for r in rows[1:]]


def test_aggregate_mode_golden_and_csv(tmp_path):
    p = read_problem(DATA / "smallProblem.txt")
    ch = Chrono.open_timestamped(str(tmp_path))
    with ch:
        r = solve_timed(p, chrono=ch)
    assert r.status == Status.OPTIMAL
    assert r.objective == pytest.approx(64.0, abs=1e-9)
    ops = [row[2] for row in read_csv(str(tmp_path))]
    for op in TIMED_OPS:
        assert op in ops, (op, ops)
    # Aggregate mode: exactly one solve row per phase + iteration counts.
    assert ops.count("solve") == 2
    assert ops.count("solveIterations") == 2


def test_per_iteration_mode_rows_match_pivots(tmp_path):
    p = read_problem(DATA / "smallProblem.txt")
    ch = Chrono.open_timestamped(str(tmp_path))
    with ch:
        r = solve_timed(p, chrono=ch, per_iteration=True)
    assert r.status == Status.OPTIMAL
    assert r.objective == pytest.approx(64.0, abs=1e-9)
    solve_rows = [row for row in read_csv(str(tmp_path))
                  if row[2] == "solve"]
    # One row per host-driven pivot step; >= pivots because each phase's
    # final (exit-detecting) step is also timed (reference behaviour:
    # the optimality-detecting cycle gets a row too, solver.cu:84-123).
    pivots = r.iterations_phase1 + r.iterations_phase2
    assert pivots <= len(solve_rows) <= pivots + 2
    # Both phases' row shapes appear: phase-1 rows = n+2m+1 tableau rows.
    vars_cols = {(row[0], row[1]) for row in solve_rows}
    assert ("8", "2") in vars_cols          # n=3, m=2 -> 3+2*2+1 = 8
    assert ("6", "2") in vars_cols          # phase 2: 3+2+1 = 6


def test_infeasible_and_agreement_with_fused_path():
    p = read_problem(DATA / "infeasibleProblem.txt")
    r = solve_timed(p)
    assert r.status == Status.INFEASIBLE
    assert r.x is None

    rng = np.random.default_rng(5)
    q = Problem(A=rng.uniform(1, 100, (20, 40)),
                b=rng.uniform(1, 100, 20), c=rng.uniform(1, 100, 40))
    rt, rf = solve_timed(q), solve(q)
    assert rt.status == rf.status == Status.OPTIMAL
    assert rt.objective == pytest.approx(rf.objective, rel=1e-12)
    assert rt.iterations_phase1 == rf.iterations_phase1
    assert rt.iterations_phase2 == rf.iterations_phase2
    np.testing.assert_allclose(rt.x, rf.x, atol=1e-9)


def test_degeneracy_reference_policy_parity():
    # Zero-RHS degenerate instance: both drivers must agree under both
    # degeneracy policies (continue-and-resolve vs reference classify).
    A = np.array([[1.0, 1.0], [1.0, -1.0]])
    p = Problem(A=A, b=np.array([2.0, 0.0]), c=np.array([1.0, 1.0]))
    for kwargs in ({}, {"degeneracy": "reference"}):
        rt, rf = solve_timed(p, **kwargs), solve(p, **kwargs)
        assert rt.status == rf.status
        if rt.status == Status.OPTIMAL:
            assert rt.objective == pytest.approx(rf.objective, rel=1e-12)


def test_per_iteration_warns_when_block_pivots_ignored():
    """--per-iteration drives the single-pivot loop; a configured
    block_pivots must produce a loud warning, not silent divergence."""
    problem = read_problem(DATA / "smallProblem.txt")
    with pytest.warns(RuntimeWarning, match="block_pivots=16 is ignored"):
        r = solve_timed(problem, per_iteration=True, block_pivots=16)
    assert r.status == Status.OPTIMAL
    assert r.objective == pytest.approx(64.0, abs=1e-8)


def test_per_iteration_debug_dumps_every_pivot(capsys):
    """debug=True + per_iteration=True prints the tableau after EVERY
    pivot (the reference's -D DEBUG behaviour, solver.cu:112-116)."""
    problem = read_problem(DATA / "smallProblem.txt")
    r = solve_timed(problem, per_iteration=True, debug=True)
    assert r.status == Status.OPTIMAL
    out = capsys.readouterr().out
    n_pivots = r.iterations_phase1 + r.iterations_phase2
    assert n_pivots >= 1
    dumps = [l for l in out.splitlines() if l.startswith("--- pivot ")]
    assert len(dumps) == n_pivots
