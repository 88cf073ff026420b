"""Multi-chip column-sharded solver tests on a virtual 8-device CPU mesh
(SURVEY.md §4d — the standard JAX fake-backend pattern; conftest.py sets
--xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from simplex_tpu import Status, solve
from simplex_tpu.generator import generate_random_problem
from simplex_tpu.oracle import solve_oracle
from simplex_tpu.parallel.sharded import solve_sharded

from conftest import assert_valid_solution


def mesh_of(n: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), ("vars",))


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_matches_oracle_random(n_devices):
    problem = generate_random_problem(60, 25, seed=7, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    got = solve_sharded(problem, mesh_of(n_devices))
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-9)
    np.testing.assert_allclose(got.x, want.x, atol=1e-7)
    assert_valid_solution(problem, got)


def test_sharded_matches_single_chip_iterations():
    """Same pivot sequence as the unsharded jitted core (deterministic
    lowest-index tie-breaking on both paths)."""
    problem = generate_random_problem(96, 40, seed=42, lo=1.0, hi=100.0)
    single = solve(problem)
    sharded = solve_sharded(problem, mesh_of(4))
    assert sharded.status == single.status == Status.OPTIMAL
    assert sharded.iterations_phase1 == single.iterations_phase1
    assert sharded.iterations_phase2 == single.iterations_phase2
    assert sharded.objective == pytest.approx(single.objective, rel=1e-12)


def test_sharded_small_problem(small_problem):
    got = solve_sharded(small_problem, mesh_of(2))
    assert got.status == Status.OPTIMAL
    want = solve_oracle(small_problem)
    assert got.objective == pytest.approx(want.objective, rel=1e-9)


def test_sharded_infeasible(infeasible_problem):
    got = solve_sharded(infeasible_problem, mesh_of(2))
    assert got.status == Status.INFEASIBLE


def test_sharded_unbounded():
    from simplex_tpu.problem import Problem

    problem = Problem(A=np.array([[-1.0, 1.0]]), b=np.array([1.0]),
                      c=np.array([1.0, 0.0]))
    got = solve_sharded(problem, mesh_of(2))
    assert got.status == Status.UNBOUNDED


@pytest.mark.parametrize("L", [4, 16])
def test_sharded_blocked_matches_oracle(L):
    """Deferred block pivoting under shard_map (same eta scheme as the
    single-chip blocked loop; C row-sharded, F replicated)."""
    from simplex_tpu.config import SolverOptions

    problem = generate_random_problem(96, 40, seed=42, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    got = solve_sharded(problem, mesh_of(4),
                        SolverOptions(block_pivots=L))
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-6)
    assert_valid_solution(problem, got)


def test_sharded_blocked_matches_unsharded_blocked():
    from simplex_tpu.config import SolverOptions

    problem = generate_random_problem(64, 24, seed=9, lo=1.0, hi=100.0)
    opt = SolverOptions(block_pivots=8)
    single = solve(problem, opt)
    sharded = solve_sharded(problem, mesh_of(2), opt)
    assert sharded.status == single.status == Status.OPTIMAL
    assert sharded.iterations_phase1 == single.iterations_phase1
    assert sharded.objective == pytest.approx(single.objective, rel=1e-9)


def test_batch_sharded_over_mesh():
    """Data-parallel scenario fleet: the batch axis sharded across the
    mesh (one device per group of LPs, no cross-LP communication)."""
    from simplex_tpu.batch import solve_batched

    problems = [generate_random_problem(30, 12, s, 1, 100)
                for s in range(8)]
    mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
    got = solve_batched(problems, mesh=mesh)
    for p, r in zip(problems, got):
        want = solve_oracle(p)
        assert r.status == want.status == Status.OPTIMAL
        assert r.objective == pytest.approx(want.objective, rel=1e-9)


def test_sharded_mixed_precision():
    from simplex_tpu.config import SolverOptions

    problem = generate_random_problem(72, 28, seed=13, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    got = solve_sharded(problem, mesh_of(4), SolverOptions(
        dtype=np.float32, vector_dtype=np.float64, eps=1e-5,
        block_pivots=8))
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-4)


def test_sharded_degenerate_continue():
    """Sharded 'continue' policy repairs the basis like the single-chip
    path (pivot_out_artificials_sharded)."""
    from simplex_tpu.problem import Problem

    A = np.array([[1.0, 1.0, 1.0],
                  [1.0, 1.0, 1.0],      # redundant duplicate
                  [1.0, -1.0, 0.0]])
    problem = Problem(A=A, b=np.array([4.0, 4.0, 0.0]),
                      c=np.array([2.0, 3.0, 1.0]))
    want = solve_oracle(problem)
    got = solve_sharded(problem, mesh_of(2))
    assert want.status == Status.OPTIMAL
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-9)
