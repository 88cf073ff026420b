"""HBM-resident tier of the batched fused kernels (kernels/batched_hbm.py).

The r5 tier that lifts the in-VMEM kernel's 28 MB per-lane gate
(VERDICT r4 next #3): same shared pivot loop, tableau parked in HBM
with per-pivot strip/slab DMAs, r-tiled window apply and re-pricing.
The contract these tests pin: BIT-IDENTICAL pivot walks and outputs
vs the in-VMEM kernel (the fetchers are the only difference), correct
end-to-end solves through the auto glue when the tableau exceeds the
VMEM budget, and the tier gate classifying the VERDICT example shape
(m=500 x n=12k, >= 24 MB/lane) as kernel-eligible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simplex_tpu import (SolverOptions, Status, generate_random_problem,
                         solve_batched, solve_oracle)
from simplex_tpu.batch import batch_kernel_tier, batch_window_len
from simplex_tpu.kernels.batched import batch_window_pass
from simplex_tpu.kernels.batched_hbm import (hbm_tier_fits,
                                             hbm_window_pass)


def _window_inputs(B=3, m_pad=128, r_pad=512, seed=0):
    rng = np.random.default_rng(seed)
    Tt = jnp.asarray(rng.uniform(-1, 1, (B * m_pad, r_pad)), jnp.float32)
    chi = jnp.asarray(rng.uniform(-1, 0.5, (B, r_pad)), jnp.float32)
    clo = jnp.zeros((B, r_pad), jnp.float32)
    bh = jnp.asarray(rng.uniform(0.1, 1, (B, m_pad)), jnp.float32)
    bl = jnp.zeros((B, m_pad), jnp.float32)
    base = jnp.tile(jnp.arange(300, 300 + m_pad, dtype=jnp.int32), (B, 1))
    w = jnp.ones((B, r_pad), jnp.float32)
    scf = jnp.zeros((B, 8), jnp.float32)
    sci = (jnp.zeros((B, 8), jnp.int32)
           .at[:, 0].set(int(Status.RUNNING))
           .at[:, 4].set(1).at[:, 5].set(10000))
    c0h = jnp.asarray(rng.uniform(-1, 1, (B, r_pad)), jnp.float32)
    c0l = jnp.zeros((B, r_pad), jnp.float32)
    cfh = jnp.take_along_axis(c0h, base, axis=1)
    cfl = jnp.zeros((B, m_pad), jnp.float32)
    return Tt, chi, clo, bh, bl, base, w, scf, sci, c0h, c0l, cfh, cfl


class TestWindowPassEquality:
    """hbm_window_pass must be BITWISE equal to batch_window_pass on
    identical inputs — the shared _window_pivot_loop guarantees the
    walk; the r-tiled apply keeps the L-contraction intact per element,
    so even the tableau is exact."""

    @pytest.mark.parametrize("rule", ["dantzig", "devex", "bland"])
    def test_bitwise_equal(self, rule):
        args = _window_inputs(seed=hash(rule) % 100)
        kw = dict(L=16, r=500, eps=1e-5,
                  bland_static=(rule == "bland"), threshold=50,
                  devex=(rule == "devex"), interpret=True)
        a = batch_window_pass(*args, **kw)
        b = hbm_window_pass(*args, **kw)
        for name, x, y in zip(
                "Tt chi clo bh bl base w scf sci cfh cfl".split(), a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name

    @pytest.mark.parametrize("cadence", [0, 1])
    def test_fused_reprice_bitwise_equal(self, cadence):
        """With fuse_reprice on (the production glue configuration for
        BOTH tiers since r5), the HBM tier's tile-stream fold + in-trace
        merge must match the in-VMEM kernel's in-kernel fold bitwise,
        with the cadence flag exercised both ways."""
        args = list(_window_inputs(B=2, m_pad=128, r_pad=640, seed=5))
        args[8] = args[8].at[:, 6].set(cadence)      # sci cadence_hit
        kw = dict(L=16, r=630, eps=1e-5, bland_static=False,
                  threshold=50, devex=True, fuse_reprice=True,
                  interpret=True)
        a = batch_window_pass(*args, **kw)
        b = hbm_window_pass(*args, **kw)
        for name, x, y in zip(
                "Tt chi clo bh bl base w scf sci cfh cfl".split(), a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name

    def test_multiwindow_chain_bitwise_equal(self):
        """Three chained windows (etas rebuilt each window, apply
        feeding the next window's stale reads) stay bitwise equal."""
        args = _window_inputs(B=2, m_pad=128, r_pad=768, seed=7)
        kw = dict(L=8, r=750, eps=1e-5, bland_static=False,
                  threshold=50, devex=False, interpret=True)
        c0h, c0l = args[9], args[10]
        a, b = args, args
        for _ in range(3):
            ra = batch_window_pass(*a, **kw)
            rb = hbm_window_pass(*b, **kw)
            a = (*ra[:9], c0h, c0l, *ra[9:])
            b = (*rb[:9], c0h, c0l, *rb[9:])
        for name, x, y in zip(
                "Tt chi clo bh bl base w scf sci c0h c0l cfh cfl".split(),
                a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name


class TestTierGate:
    def test_beyond_vmem_shapes_are_hbm_eligible(self):
        """Lane shapes past the VMEM budget (the class VERDICT r4
        missing #2 flags — m=500 x n=12k lands at 28.5 MB and still
        squeezes under the 28 MB+scratch budget at L=32; m=500 x n=14k
        and m=1000 x n=12k do not) must classify as the HBM kernel
        tier, not the vmapped fallback."""
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=32)
        assert batch_kernel_tier(opts, 14000, 500) == "hbm"
        assert batch_kernel_tier(opts, 12000, 1000) == "hbm"
        # the VERDICT example itself gets a kernel tier either way
        assert batch_kernel_tier(opts, 12000, 500) in ("vmem", "hbm")

    def test_config3_stays_vmem(self):
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             block_pivots=32)
        assert batch_kernel_tier(opts, 3072, 512) == "vmem"

    def test_f64_config_gets_no_tier(self):
        assert batch_kernel_tier(SolverOptions(block_pivots=32),
                                 12000, 500) is None

    def test_fits_scales_far_past_vmem(self):
        # a 100k-variable lane's working set still fits the HBM tier
        assert hbm_tier_fits(512, 100096, 32)


class TestNonDivisorTileShapes:
    """r_pad values with no divisor in pick_tile_div's preferred band
    (4224 = 128*33, 15104 = 128*118 — 33 and 118 have no factor
    landing a multiple of 128 in [target/2, target]) made the r-tiled
    apply/reprice fall back to a NON-divisor tile; the floor-divided
    grid then silently skipped the last partial tile. Found ON SILICON
    (corrupted phase-2 tableau -> iteration-fuse spin -> TPU watchdog
    kill); pick_tile_div_strict + these pins close it."""

    def test_strict_picker_always_divides(self):
        from simplex_tpu.kernels.blocked import pick_tile_div_strict

        for r_pad in (4224, 15104, 14080, 4608, 512, 14208, 128 * 59,
                      128 * 7 * 13):
            t = pick_tile_div_strict(r_pad, 128, 4096)
            assert r_pad % t == 0 and t <= max(4096, r_pad if r_pad <= 4096 else 4096)

    @pytest.mark.parametrize("r_pad", [4224, 2688])
    def test_apply_covers_whole_axis(self, r_pad):
        from simplex_tpu.kernels.batched_hbm import hbm_apply_pass

        B, m_pad, L = 2, 512, 32
        rng = np.random.default_rng(3)
        Tt = jnp.asarray(rng.uniform(-1, 1, (B * m_pad, r_pad)),
                         jnp.float32)
        C = jnp.asarray(rng.uniform(-1, 1, (B * L, r_pad)), jnp.float32)
        Ft = jnp.asarray(rng.uniform(-1, 1, (B * m_pad, L)), jnp.float32)
        got = np.asarray(hbm_apply_pass(Tt, C, Ft, interpret=True))
        want = np.asarray(Tt.reshape(B, m_pad, r_pad)
                          - jnp.einsum("bml,blr->bmr",
                                       Ft.reshape(B, m_pad, L),
                                       C.reshape(B, L, r_pad),
                                       precision="highest")
                          ).reshape(B * m_pad, r_pad)
        # the LAST columns are the ones the non-divisor grid dropped
        np.testing.assert_allclose(got[:, -128:], want[:, -128:],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_window_pass_equality_at_bad_shape(self):
        args = _window_inputs(B=2, m_pad=512, r_pad=4224, seed=11)
        kw = dict(L=32, r=4100, eps=1e-5, bland_static=False,
                  threshold=50, devex=True, interpret=True)
        a = batch_window_pass(*args, **kw)
        b = hbm_window_pass(*args, **kw)
        for name, x, y in zip(
                "Tt chi clo bh bl base w scf sci cfh cfl".split(), a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name


class TestEndToEndForcedHbm:
    """Full two-phase solves through the auto glue with the VMEM budget
    forced to zero, so solve_loop_batched_kernel picks the HBM tier —
    results must match the (unforced) in-VMEM kernel path exactly and
    the oracle within the mixed envelope, then refine to 1e-9."""

    def _solve(self, problems, opts, monkeypatch, budget):
        import simplex_tpu.kernels.batched as bk

        monkeypatch.setattr(bk, "VMEM_TILE_BUDGET", budget)
        return solve_batched(problems, opts, kernel="interpret")

    def test_forced_hbm_matches_vmem_and_oracle(self, monkeypatch):
        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             eps=1e-5, block_pivots=8,
                             pivot_rule="dantzig")
        problems = [generate_random_problem(200, 96, s, 1, 100)
                    for s in (31, 32)]
        want = self._solve(problems, opts, monkeypatch, 1 << 30)  # vmem
        jax.clear_caches()   # distinct compile: the tier is trace-time
        got = self._solve(problems, opts, monkeypatch, 0)         # hbm
        for p, a, b in zip(problems, want, got):
            assert a.status == b.status == Status.OPTIMAL
            assert (a.iterations_phase1, a.iterations_phase2) == (
                b.iterations_phase1, b.iterations_phase2)
            assert a.objective == b.objective, (a.objective, b.objective)
            ro = solve_oracle(p)
            assert b.refine is not None and b.refine.certified
            assert b.objective == pytest.approx(ro.objective, rel=1e-9)

    def test_forced_hbm_devex_and_statuses(self, monkeypatch):
        """Status spread (OPTIMAL/INFEASIBLE/UNBOUNDED lanes) under the
        HBM tier with devex — the default production rule."""
        from simplex_tpu.problem import Problem

        opts = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                             eps=1e-5, block_pivots=8)
        assert opts.pivot_rule_resolved == "devex"
        lanes = [
            Problem(A=np.array([[1.0, 0.0], [0.0, 1.0]]),
                    b=np.array([1.0, 2.0]), c=np.array([3.0, 5.0])),
            Problem(A=np.array([[-1.0, 0.0], [1.0, 0.0]]),
                    b=np.array([-1.0, 0.5]), c=np.array([1.0, 0.0])),
            Problem(A=np.array([[1.0, -1.0], [0.0, 0.0]]),
                    b=np.array([1.0, 1.0]), c=np.array([1.0, 1.0])),
        ]
        jax.clear_caches()
        got = self._solve(lanes, opts, monkeypatch, 0)
        assert got[0].status == Status.OPTIMAL
        assert got[1].status == Status.INFEASIBLE
        assert got[2].status == Status.UNBOUNDED
        assert got[0].objective == pytest.approx(13.0, rel=1e-9)
