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


def test_sharded_dropped_constraint_sentinel_no_alias():
    """A redundant constraint dropped by pivot_out_artificials_sharded
    must mark its base entry with a GLOBALLY out-of-range sentinel. Under
    shard_map ``rows_padded`` is the local row count (R_loc = 8 on this
    mesh), which aliases structural variable x8 — before the fix the
    solution scatter silently zeroed x8's basic value."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from simplex_tpu.config import SolverOptions
    from simplex_tpu.parallel import sharded as sh
    from simplex_tpu.tableau import Tableau

    options = SolverOptions()
    n, m, n_shards = 40, 3, 8
    R_pad, M_pad = sh.sharded_padded_dims(n, m, n_shards, options)
    r = n + 2 * m
    assert R_pad // n_shards == 8         # the aliasing configuration
    T = np.zeros((R_pad, M_pad))
    T[8, 0] = 1.0           # x8 basic in constraint 0, value 7.5
    T[n + m + 1, 1] = 1.0   # artificial basic in an all-zero redundant row
    T[12, 2] = 1.0          # x12 basic in constraint 2, value 3.0
    b = np.zeros(M_pad)
    b[0], b[2] = 7.5, 3.0
    base = np.full(M_pad, r, np.int32)
    base[:m] = [8, n + m + 1, 12]
    tab = Tableau(T=jnp.asarray(T), b=jnp.asarray(b),
                  costs=jnp.zeros((R_pad,)), z=jnp.zeros(()),
                  base=jnp.asarray(base), n=n, m=m, r=r)
    specs = Tableau(T=P("vars", None), b=P(None), costs=P("vars"), z=P(),
                    base=P(None), n=n, m=m, r=r)
    mesh = mesh_of(n_shards)
    fn = jax.jit(jax.shard_map(
        lambda t: sh.extract_solution_replicated(
            sh.pivot_out_artificials_sharded(t, options)),
        mesh=mesh, in_specs=(specs,), out_specs=P(None),
        check_vma=False))
    x = np.asarray(fn(tab))
    assert x[8] == pytest.approx(7.5)
    assert x[12] == pytest.approx(3.0)


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


# ---------------------------------------------------------------------------
# Semantic parity: the sharded core must return the same statuses and
# objectives as the single-chip core on identical inputs (VERDICT r2 #3).
# One parametrized harness runs the same assertions against both solvers.

def _solve_with(solver, problem, **opts):
    from simplex_tpu.config import SolverOptions

    options = SolverOptions(**opts) if opts else None
    if solver == "single":
        return solve(problem, options)
    return solve_sharded(problem, mesh_of(4),
                         options or SolverOptions())


@pytest.mark.parametrize("solver", ["single", "sharded"])
@pytest.mark.parametrize("poison", ["A", "b", "c"])
def test_numeric_guard_nan_input(solver, poison):
    """A non-finite entry in any input must return NUMERIC (not OPTIMAL
    with garbage) from BOTH cores — the pre-flight guard of
    two_phase.solve_device:118 and its sharded mirror."""
    problem = generate_random_problem(48, 16, seed=3, lo=1.0, hi=100.0)
    arr = getattr(problem, poison).copy()
    arr.flat[arr.size // 2] = np.nan
    from simplex_tpu.problem import Problem

    poisoned = Problem(
        A=arr if poison == "A" else problem.A,
        b=arr if poison == "b" else problem.b,
        c=arr if poison == "c" else problem.c)
    got = _solve_with(solver, poisoned)
    assert got.status == Status.NUMERIC
    assert got.x is None


@pytest.mark.parametrize("solver", ["single", "sharded"])
def test_inf_input_numeric(solver):
    from simplex_tpu.problem import Problem

    problem = generate_random_problem(32, 12, seed=5, lo=1.0, hi=100.0)
    A = problem.A.copy()
    A[3, 7] = np.inf
    got = _solve_with(solver, Problem(A=A, b=problem.b, c=problem.c))
    assert got.status == Status.NUMERIC


def test_sharded_objective_bitwise_equals_single_chip():
    """Both cores report the recomputed ``c @ x`` objective; on an f64
    problem where the pivot walks coincide, x is bitwise identical (the
    sharded a_h psum adds exact zeros), so the objectives must be EQUAL —
    not approximately equal (two_phase.solve_device:183-188 and the
    sharded mirror)."""
    for seed in (7, 42, 99):
        problem = generate_random_problem(64, 24, seed=seed,
                                          lo=1.0, hi=100.0)
        single = solve(problem)
        sharded = solve_sharded(problem, mesh_of(4))
        assert single.status == sharded.status == Status.OPTIMAL
        assert sharded.iterations_phase1 == single.iterations_phase1
        assert sharded.iterations_phase2 == single.iterations_phase2
        assert float(sharded.objective) == float(single.objective), seed
        np.testing.assert_array_equal(sharded.x, single.x)
