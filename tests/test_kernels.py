"""Kernel-path tests: Pallas fused pivot (interpret mode on CPU) and the
deferred block-pivot loop vs the sequential reference loop / oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import Status, solve
from simplex_tpu.config import SolverOptions
from simplex_tpu.generator import generate_random_problem
from simplex_tpu.kernels.pivot import (BIG_INDEX, entering_candidates,
                                       fused_pivot)
from simplex_tpu.oracle import solve_oracle
from simplex_tpu.solver import (choose_entering, pivot_update, ratio_test,
                                solve_loop, solve_loop_blocked)
from simplex_tpu.tableau import build_phase1, gaussian_eliminate


def _tableau(n=60, m=20, seed=5, dtype=np.float64):
    opt = SolverOptions(dtype=np.dtype(dtype))
    rng = np.random.Generator(np.random.Philox(key=seed))
    A = jnp.asarray(rng.uniform(1, 100, (m, n)), opt.dtype)
    b = jnp.asarray(rng.uniform(1, 100, (m,)), opt.dtype)
    return gaussian_eliminate(build_phase1(A, b, n, m, opt)), opt


class TestFusedPivotInterpret:
    """fused_pivot semantics vs the XLA pivot_update (interpret mode —
    the TPU lowering is exercised by bench.py / axon runs)."""

    def test_matches_xla_update_and_argmin(self):
        tab, opt = _tableau()
        eps = 1e-9
        h, minc = choose_entering(tab, jnp.asarray(False), eps)
        a_h = tab.T[h]
        k, unbounded = ratio_test(tab, a_h, eps)
        assert not bool(unbounded)

        ref = pivot_update(tab, h, k, minc)
        T2, costs2, h_d, v_d, h_b, v_b = fused_pivot(
            tab.T, tab.costs, tab.T[:, k], a_h, a_h[k], minc, k, tab.r,
            eps, interpret=True)

        np.testing.assert_allclose(np.asarray(ref.T), np.asarray(T2),
                                   rtol=1e-12, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ref.costs),
                                   np.asarray(costs2), rtol=1e-12,
                                   atol=1e-9)
        h_ref, minc_ref = choose_entering(ref, jnp.asarray(False), eps)
        assert int(h_d) == int(h_ref)
        assert float(v_d) == pytest.approx(float(minc_ref), rel=1e-12)
        hb_ref, _ = choose_entering(ref, jnp.asarray(True), eps)
        assert int(h_b) == int(hb_ref)

    def test_identity_pass_when_do_pivot_false(self):
        tab, opt = _tableau()
        T2, costs2, *_ = fused_pivot(
            tab.T, tab.costs, tab.T[:, 3], tab.T[7], tab.T[7, 3],
            jnp.asarray(-1.0, tab.T.dtype), jnp.asarray(3), tab.r, 1e-9,
            do_pivot=jnp.asarray(False), interpret=True)
        np.testing.assert_array_equal(np.asarray(tab.T), np.asarray(T2))
        np.testing.assert_array_equal(np.asarray(tab.costs),
                                      np.asarray(costs2))

    def test_entering_candidates_sentinel(self):
        costs = jnp.asarray([1.0, 2.0, 3.0, 0.0])
        h_d, v_d, h_b, v_b = entering_candidates(costs, 3, 1e-9)
        assert int(h_d) == 0 and float(v_d) == 1.0
        assert int(h_b) == BIG_INDEX and float(v_b) == np.inf


class TestBlockedLoop:
    """Deferred block pivoting (solver.solve_loop_blocked)."""

    @pytest.mark.parametrize("L", [1, 2, 8, 32])
    def test_matches_sequential_loop_f64(self, L):
        tab, opt = _tableau(n=80, m=25, seed=11)
        optb = dataclasses.replace(opt, block_pivots=L)
        tx, sx, ix = solve_loop(tab, opt, 2000)
        tb, sb, ib = solve_loop_blocked(tab, optb, 2000)
        assert int(sx) == int(sb) == int(Status.OPTIMAL)
        assert int(ix) == int(ib)
        assert np.array_equal(np.asarray(tx.base), np.asarray(tb.base))
        np.testing.assert_allclose(np.asarray(tx.b), np.asarray(tb.b),
                                   rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("seed", [1, 7, 42])
    def test_end_to_end_vs_oracle(self, seed):
        problem = generate_random_problem(120, 40, seed, 1, 100)
        want = solve_oracle(problem)
        got = solve(problem, block_pivots=16)
        assert got.status == Status.OPTIMAL
        assert got.objective == pytest.approx(want.objective, rel=1e-6)

    def test_unbounded(self):
        from simplex_tpu.problem import Problem

        problem = Problem(A=np.array([[-1.0, 1.0]]), b=np.array([1.0]),
                          c=np.array([1.0, 0.0]))
        got = solve(problem, block_pivots=8)
        assert got.status == Status.UNBOUNDED

    def test_infeasible(self, infeasible_problem):
        got = solve(infeasible_problem, block_pivots=8)
        assert got.status == Status.INFEASIBLE


class TestMixedPrecision:
    """f32 tableau + f64 vectors (SolverOptions.vector_dtype): the
    vectors that integrate per-pivot updates stay drift-free while the
    tableau keeps f32 memory/bandwidth."""

    def test_dtypes(self):
        from simplex_tpu.tableau import build_phase1 as bp

        opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64)
        tab, _ = _tableau(n=20, m=8, dtype=np.float32)
        tab2 = bp(jnp.asarray(np.ones((8, 20))),
                  jnp.asarray(np.ones(8)), 20, 8, opt)
        assert tab2.T.dtype == jnp.float32
        assert tab2.b.dtype == jnp.float64
        assert tab2.costs.dtype == jnp.float64
        assert tab2.z.dtype == jnp.float64

    @pytest.mark.parametrize("L", [None, 16])
    def test_matches_oracle(self, L):
        problem = generate_random_problem(150, 60, 9, 1, 100)
        want = solve_oracle(problem)
        got = solve(problem, dtype=np.float32, vector_dtype=np.float64,
                    eps=1e-5, block_pivots=L)
        assert got.status == Status.OPTIMAL
        assert got.objective == pytest.approx(want.objective, rel=1e-4)


def test_use_pallas_gated_off_tpu():
    """An explicit use_pallas=True must NOT enable the kernel path off
    TPU (it would crash inside pl.pallas_call); tests cover the kernel
    on CPU via interpret mode instead."""
    from simplex_tpu.solver import use_pallas

    assert jax.default_backend() != "tpu"   # conftest forces CPU
    assert not use_pallas(SolverOptions(dtype=np.float32,
                                        vector_dtype=np.float32,
                                        use_pallas=True))
    assert not use_pallas(SolverOptions(dtype=np.float32,
                                        vector_dtype=np.float32))


def test_use_pallas_auto_prefers_xla_sequential(monkeypatch):
    """'auto' resolves the SEQUENTIAL loop to pure XLA even on TPU (the
    kernel measured slower there, BENCHMARKS.md); only an explicit
    use_pallas=True dispatches kernels/pivot.py."""
    import simplex_tpu.solver as solver_mod
    from simplex_tpu.solver import use_pallas

    monkeypatch.setattr(solver_mod.jax, "default_backend", lambda: "tpu")
    f32 = dict(dtype=np.float32, vector_dtype=np.float32)
    assert not use_pallas(SolverOptions(**f32))                  # auto
    assert not use_pallas(SolverOptions(**f32, use_pallas=False))
    assert use_pallas(SolverOptions(**f32, use_pallas=True))
