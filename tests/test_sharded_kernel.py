"""Sharded fused blocked-pivot loop (parallel/sharded.py
solve_loop_blocked_kernel_sharded) on the virtual 8-device CPU mesh,
kernels in Pallas interpret mode — mirrors test_blocked_kernel.py's
strategy of pinning the kernel path to the pure-XLA reference loops
(SURVEY.md §4d fake-backend pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from simplex_tpu import Status, solve
from simplex_tpu.config import SolverOptions
from simplex_tpu.generator import generate_random_problem
from simplex_tpu.oracle import solve_oracle
from simplex_tpu.parallel.sharded import make_sharded_solver

from conftest import assert_valid_solution


def mesh_of(n: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), ("vars",))


def solve_sharded_kernel(problem, n_devices, options):
    """solve_sharded, but through make_sharded_solver(interpret=True) so
    the fused kernel path runs on the CPU mesh."""
    from simplex_tpu.result import SolveResult

    m, n = problem.constraints, problem.vars
    fn = make_sharded_solver(mesh_of(n_devices), n, m, options,
                             interpret=True)
    out = jax.device_get(fn(jnp.asarray(problem.A), jnp.asarray(problem.b),
                            jnp.asarray(problem.c)))
    status = Status(int(out.status))
    return SolveResult(
        status=status,
        x=np.asarray(out.x) if status == Status.OPTIMAL else None,
        objective=float(out.objective),
        iterations_phase1=int(out.iterations_phase1),
        iterations_phase2=int(out.iterations_phase2),
        degenerate=bool(out.n_artificial_in_base > 0),
    )


# Walk-equality pins are Dantzig artifacts: since the default pivot
# rule resolves to devex for f32 blocked configs (r5), the exact
# cross-implementation pivot-sequence tests pin dantzig explicitly —
# devex scores are f32-representation-sensitive at near-ties, so its
# guarantee is optimality (+ refinement), not walk equality; the
# devex-specific tests below cover it against the oracle.
MIXED = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                      eps=1e-5, block_pivots=8, pivot_rule="dantzig")


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_kernel_sharded_matches_single_chip(n_devices):
    """Same pivot sequence as the unsharded pure-XLA blocked loop (the
    kernel passes + the collective folds reproduce its Dantzig/Bland
    choices exactly)."""
    problem = generate_random_problem(96, 24, seed=7, lo=1.0, hi=100.0)
    single = solve(problem, MIXED)
    got = solve_sharded_kernel(problem, n_devices, MIXED)
    assert got.status == single.status == Status.OPTIMAL
    assert got.iterations_phase1 == single.iterations_phase1
    assert got.iterations_phase2 == single.iterations_phase2
    assert got.objective == pytest.approx(single.objective, rel=1e-5)
    assert_valid_solution(problem, got)


def test_kernel_sharded_matches_oracle():
    problem = generate_random_problem(72, 28, seed=13, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    got = solve_sharded_kernel(problem, 4, MIXED)
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-4)


def test_kernel_sharded_pure_f32():
    """vector_dtype == dtype == f32: the double-f32 cost pair still makes
    window-boundary re-pricing exact enough for toy sizes."""
    opt = SolverOptions(dtype=np.float32, block_pivots=8, eps=1e-4)
    problem = generate_random_problem(64, 16, seed=3, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    got = solve_sharded_kernel(problem, 2, opt)
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-3)


def test_kernel_sharded_infeasible(infeasible_problem):
    got = solve_sharded_kernel(infeasible_problem, 2, MIXED)
    assert got.status == Status.INFEASIBLE


def test_kernel_sharded_unbounded():
    from simplex_tpu.problem import Problem

    problem = Problem(A=np.array([[-1.0, 1.0]]), b=np.array([1.0]),
                      c=np.array([1.0, 0.0]))
    got = solve_sharded_kernel(problem, 2, MIXED)
    assert got.status == Status.UNBOUNDED


def test_kernel_sharded_degenerate_continue():
    """Redundant constraint: phase-1 ends degenerate, the sharded
    pivot-out repair runs between the two kernel-loop phases."""
    from simplex_tpu.problem import Problem

    A = np.array([[1.0, 1.0, 1.0],
                  [1.0, 1.0, 1.0],
                  [1.0, -1.0, 0.0]])
    problem = Problem(A=A, b=np.array([4.0, 4.0, 0.0]),
                      c=np.array([2.0, 3.0, 1.0]))
    want = solve_oracle(problem)
    got = solve_sharded_kernel(problem, 2, MIXED)
    assert want.status == Status.OPTIMAL
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-5)


def test_kernel_sharded_padding_is_lane_aligned():
    """sharded_padded_dims pads every local shard to whole 128-lane
    tiles when the kernel path is requested."""
    from simplex_tpu.parallel.sharded import sharded_padded_dims

    opt = SolverOptions(dtype=np.float32, block_pivots=8)
    R_pad, _ = sharded_padded_dims(100, 7, 8, opt, kernel=True)
    assert R_pad % (128 * 8) == 0


@pytest.mark.slow
def test_kernel_sharded_multiwindow_stress():
    """Multi-window stress at a non-toy shape (VERDICT r2 #7): 384 vars x
    96 constraints on 8 shards with L=32 — hundreds of pivots spanning
    many windows and window-boundary re-prices PER SHARD, with multiple
    liveness segments (SEG=32) live at once. Exercises the r_lim edge at
    shard boundaries, multi-segment liveness, and the candidate fold under
    load; asserts pivot-sequence equality with the single-chip pure-XLA
    blocked loop (same L), which test_blocked_kernel.py separately pins to
    the sequential reference loop."""
    opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                         eps=1e-5, block_pivots=32, pivot_rule="dantzig")
    problem = generate_random_problem(384, 96, seed=21, lo=1.0, hi=100.0)
    single = solve(problem, opts)
    assert single.status == Status.OPTIMAL
    # Non-toy: the walk must span >= 4 windows (128+ pivots) so several
    # re-price boundaries and multi-segment liveness actually happen.
    assert single.iterations_phase1 + single.iterations_phase2 >= 128, (
        single.iterations_phase1, single.iterations_phase2)
    got = solve_sharded_kernel(problem, 8, opts)
    assert got.status == Status.OPTIMAL
    assert got.iterations_phase1 == single.iterations_phase1
    assert got.iterations_phase2 == single.iterations_phase2
    # 1e-4: the two paths take the SAME pivot walk but different f32
    # summation orders (Pallas pair arithmetic vs XLA dots); over ~600
    # pivots the objective difference measured ~2e-5 relative — within
    # the documented mixed-precision envelope, anchored to the oracle.
    assert got.objective == pytest.approx(single.objective, rel=1e-4)
    want = solve_oracle(problem)
    assert got.objective == pytest.approx(want.objective, rel=1e-4)
    # f32 tableau noise puts ~2e-5 relative slack in the constraints at
    # this pivot count (measured); 1e-4 is the mixed-mode envelope.
    assert_valid_solution(problem, got, tol=1e-4)


@pytest.mark.parametrize("rule,want_gathers", [("dantzig", 8),
                                               ("devex", 9)])
def test_per_pivot_collective_structure_pinned(rule, want_gathers):
    """Regression guard on the sharded kernel loop's communication
    structure (the §5 cost model): the traced program must contain
    EXACTLY 8 all_gathers + 2 psums under Dantzig (9 under devex — the
    candidate fold carries the winner's weight as one extra gathered
    scalar pair) —

    * inner pivot body: 2 all_gathers (the stacked candidate-value and
      candidate-index folds) + 1 psum (the (M_pad,) live entering row);
      the r3 fold carries the candidate VALUES, so there is no separate
      minc psum;
    * window boundary: 1 psum (basic-coeff gather) + 1 all_gather
      (premature-optimal vmin) + 2 all_gathers (post-reprice candidate
      fold);
    * one-time: 2 all_gathers (initial candidate fold) + 1 all_gather
      (the scale-aware pricing max).

    A change that adds a per-pivot collective (or reintroduces the minc
    psum) fails this test before it costs real ICI latency."""
    from collections import Counter
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from simplex_tpu.parallel import sharded as sh
    from simplex_tpu.tableau import Tableau

    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        eps=1e-5, block_pivots=8, pivot_rule=rule)
    n, m = 96, 24
    mesh = mesh_of(4)
    R_pad, M_pad = sh.sharded_padded_dims(n, m, 4, opt, kernel=True)
    tab = Tableau(T=jnp.zeros((R_pad, M_pad), jnp.float32),
                  b=jnp.zeros((M_pad,)), costs=jnp.zeros((R_pad,)),
                  z=jnp.zeros(()), base=jnp.zeros((M_pad,), jnp.int32),
                  n=n, m=m, r=n + 2 * m)
    specs = Tableau(T=P("vars", None), b=P(None), costs=P("vars"),
                    z=P(), base=P(None), n=n, m=m, r=n + 2 * m)
    fn = jax.shard_map(
        lambda t, c0: sh.run_solve_loop_sharded(t, opt, 100, c0, True),
        mesh=mesh, in_specs=(specs, P("vars")),
        out_specs=(specs, P(), P()), check_vma=False)
    jaxpr = jax.make_jaxpr(fn)(tab, jnp.zeros((R_pad,)))

    def walk(jx, c):
        for eqn in jx.eqns:
            c[eqn.primitive.name] += 1
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for x in vs:
                    if hasattr(x, "jaxpr"):
                        walk(x.jaxpr, c)
                    elif hasattr(x, "eqns"):
                        walk(x, c)
        return c

    counts = walk(jaxpr.jaxpr, Counter())
    collectives = {k: v for k, v in counts.items()
                   if k in ("all_gather", "psum", "psum_invariant",
                            "all_to_all", "ppermute", "pmin", "pmax")}
    assert collectives == {"all_gather": want_gathers, "psum": 2}, (
        rule, collectives)


def test_kernel_sharded_devex_matches_oracle():
    """Sharded devex (weights shard with the costs; the candidate fold
    carries scores + winner weight): oracle optimum with a pivot count
    in the devex regime, across 4 shards."""
    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        eps=1e-5, block_pivots=8, pivot_rule="devex")
    problem = generate_random_problem(96, 40, seed=5, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    dant = solve_sharded_kernel(problem, 4, SolverOptions(
        dtype=np.float32, vector_dtype=np.float64, eps=1e-5,
        block_pivots=8, pivot_rule="dantzig"))
    got = solve_sharded_kernel(problem, 4, opt)
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-4)
    assert (got.iterations_phase1 + got.iterations_phase2
            < dant.iterations_phase1 + dant.iterations_phase2)


def test_kernel_sharded_devex_matches_single_chip():
    """Sharded devex pivot counts match the single-chip KERNEL loop's
    devex walk (both fold hi-f32 scores; 2 shards)."""
    import dataclasses as dc

    from simplex_tpu.solver import solve_loop_blocked_kernel
    from simplex_tpu.tableau import build_phase1, gaussian_eliminate, \
        round_up

    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        eps=1e-5, block_pivots=8, pivot_rule="devex")
    problem = generate_random_problem(96, 24, seed=7, lo=1.0, hi=100.0)
    got = solve_sharded_kernel(problem, 2, opt)
    # single-chip kernel loop, phase-1 only comparison via full solve:
    single = solve_sharded_kernel(problem, 1, opt)
    assert got.status == single.status == Status.OPTIMAL
    assert got.iterations_phase1 == single.iterations_phase1
    assert got.iterations_phase2 == single.iterations_phase2
    assert got.objective == pytest.approx(single.objective, rel=1e-5)


def test_sharded_devex_rejects_sequential_path():
    # Devex needs the deferred block-pivot loops (which carry the
    # weights); the sequential sharded loop rejects it, mirroring
    # solver.run_solve_loop's gate.
    opt = SolverOptions(pivot_rule="devex")   # block_pivots=None
    problem = generate_random_problem(32, 12, seed=3, lo=1.0, hi=100.0)
    with pytest.raises(ValueError, match="devex"):
        solve_sharded_kernel(problem, 2, opt)


def test_xla_fallback_sharded_devex_matches_single_chip():
    """Devex on the sharded XLA-fallback blocked loop (f64 tableau, so
    the fused-kernel path is ineligible): identical status, pivot counts
    and objective to the single-chip blocked XLA devex walk, plus the
    oracle optimum."""
    from simplex_tpu.two_phase import solve

    opt = SolverOptions(block_pivots=8, pivot_rule="devex")   # f64
    problem = generate_random_problem(48, 16, seed=9, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    single = solve(problem, opt)
    got = solve_sharded_kernel(problem, 4, opt)
    assert got.status == single.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-9)
    assert got.iterations_phase1 == single.iterations_phase1
    assert got.iterations_phase2 == single.iterations_phase2


def test_xla_fallback_sharded_devex_degenerate_guard():
    """ADVICE r3 (low): devex_update_sharded's leaving-weight guard must
    match the single-chip update's (any in-range row, including a basic
    ARTIFICIAL leaving in phase 2 under degeneracy='continue') so the
    weight state and 1e8 re-anchor trigger stay identical across the two
    paths on degenerate instances — pinned by exact pivot-count parity
    on the canonical degenerate fixtures."""
    from simplex_tpu.problem import Problem
    from simplex_tpu.two_phase import solve

    opt = SolverOptions(block_pivots=8, pivot_rule="devex")   # f64 XLA
    fixtures = [
        Problem(A=np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0],
                            [1.0, -1.0, 0.0]]),
                b=np.array([4.0, 4.0, 0.0]),
                c=np.array([2.0, 3.0, 1.0])),
        Problem(A=np.array([[1.0, 1.0, 0.0], [-1.0, -1.0, 0.0],
                            [1.0, 0.0, 0.0]]),
                b=np.array([3.0, -3.0, 2.0]),
                c=np.array([1.0, 2.0, 0.0])),
    ]
    for problem in fixtures:
        single = solve(problem, opt)
        got = solve_sharded_kernel(problem, 2, opt)
        assert got.status == single.status
        assert got.iterations_phase1 == single.iterations_phase1
        assert got.iterations_phase2 == single.iterations_phase2
        assert got.objective == pytest.approx(single.objective, rel=1e-9)


def test_xla_fallback_sharded_devex_mixed_precision():
    """Mixed-precision devex through the XLA fallback (kernels forced
    off): window re-pricing + devex weights together across 2 shards."""
    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        eps=1e-5, block_pivots=8, pivot_rule="devex",
                        use_pallas=False)
    problem = generate_random_problem(64, 20, seed=13, lo=1.0, hi=100.0)
    want = solve_oracle(problem)
    got = solve_sharded_kernel(problem, 2, opt)
    assert got.status == Status.OPTIMAL
    assert got.objective == pytest.approx(want.objective, rel=1e-4)
