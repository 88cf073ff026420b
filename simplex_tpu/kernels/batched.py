"""Batched fused solve kernels: many small LPs, whole tableaus in VMEM.

North-star config 3 (batched scenario solving) at kernel speed. The
vmapped XLA blocked loop (batch.py's fallback) pays per-pivot XLA op
overhead times the batch and re-reads the eta factors with no liveness
skipping under vmap — measured 439 ms/instance at 256 x (m=500, n=2k)
(BENCHMARKS.md). At these sizes a lane's ENTIRE tableau (m_pad x r_pad
f32, a few MB) fits in VMEM, so one grid step per lane keeps the tableau
resident and runs a whole window of L pivots with zero HBM traffic
between pivots and zero per-pivot dispatch.

The per-pivot economy is the flagship deferred-eta scheme
(solver.solve_loop_blocked_kernel), not a direct rank-1 update: the eta
factors C (L, r_pad) / F (L, m_pad) live in VMEM scratch, each pivot
does only O(L*(r+m)) work (stale-vector fetches corrected against the
etas via small one-hot MXU matvecs), and the O(m*r) tableau update runs
ONCE per window as a single MXU ``Tt - F^T @ C``. A direct rank-1
variant (full-tile VPU pass per pivot) measured 0.27 ms per in-kernel
pivot at config-3 shapes — two orders of magnitude off the arithmetic
bound; full-tile masked selects per pivot are the wrong economy even
from VMEM.

Numerics contract matches the fused blocked-kernel loop
(kernels/blocked.py): f32 tableau; costs, b and z carried as
double-float32 (hi, lo) pairs updated with error-free Dekker transforms
(~2^-48 relative); pivot DECISIONS are pair-exact — entering
eligibility via ``pair_eligible`` (cost + eps resolved through an
error-free two_sum), Dantzig/devex selection by pair-lexicographic
(hi, lo) ordering, and the min-ratio test on pair-divided ratios with
pair-lexicographic tie ordering. The window re-pricing
premature-optimal reopen check shares ``pair_eligible`` on the repriced
pair, so glue and kernel can never disagree about "no eligible
column". Exact window-boundary re-pricing is FUSED into the window
pass on both tiers (in-kernel fold here; per-applied-tile fold in the
HBM tier); ``batch_reprice_pass`` remains as the standalone reference
implementation both fused folds are pinned bit-identical against.

Reference semantics mirrored per pivot (src/solver.cu:78-126): Dantzig
argmin entering (lowest index on ties), ``a_h >= eps`` min-ratio leaving
(lowest index on ties), plus this repo's Bland anti-cycling fallback
(solver.anticycling_update, identical policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Status
from .blocked import (BIG_INDEX, _fast_two_sum, _i0, _two_prod,
                      _two_sum)

#: Soft VMEM budget for one lane's tableau block (bytes). A grid step
#: holds ~2 tableau blocks (separate in/out VMEM windows for the aliased
#: pair) plus the eta scratch and pipelining headroom; 28 MB keeps the
#: working set under the 100 MB scoped-vmem cap.
VMEM_TILE_BUDGET = 28 * 1024 * 1024


def batch_kernel_fits(m_pad: int, r_pad: int, l: int = 128) -> bool:
    """Whether one lane's (m_pad, r_pad) f32 tableau plus the L-scaled
    eta scratch — the (l, r_pad) F-factor slab and the (m_pad, l)
    C-factor slab the window kernel keeps VMEM-resident — fits the
    in-VMEM window budget (the whole-tableau-resident design only makes
    sense when it does; bigger lanes fall back to the vmapped XLA
    loop). ``l`` defaults to the largest allowed in-kernel window so an
    ``batch_block_pivots`` override can never outgrow a gate that
    passed."""
    scratch = (l * r_pad + m_pad * l) * 4
    return m_pad * r_pad * 4 + scratch <= VMEM_TILE_BUDGET


def pair_eligible(chi, clo, eps32):
    """The in-kernel PAIR-EXACT entering-eligibility test: whether the
    double-f32 reduced cost (chi, clo) satisfies cost + eps32 <= 0,
    resolved through an error-free two_sum (~2^-48 of the cost scale).

    This is the single source of truth for the kernel's optimality
    decision ("no eligible column"): the window glue's premature-optimal
    reopen test (batch.py) MUST evaluate this same f32 arithmetic on the
    repriced pair — a reopen threshold on any other representation
    (e.g. ``f64(hi)+f64(lo) <= -eps`` with the f64 eps) disagrees with
    the kernel whenever f32(eps) != eps, and a reduced cost landing
    between the two thresholds reopens a lane in which the kernel finds
    no eligible column: a zero-pivot window cycle that spins to a false
    MAXITER (ADVICE r3)."""
    s1, e1 = _two_sum(chi, eps32)
    return (s1 + (e1 + clo)) <= 0


def _window_pivot_loop(fetch_hstrip, fetch_kslab, C_ref, Ft_ref, init,
                       *, L, r, m_pad, r_pad, eps, bland_static,
                       threshold, devex, active0, max_iter0,
                       fetch_c0strip=None):
    """The shared per-window pivot loop: up to L deferred eta pivots
    against VMEM-resident vectors and eta scratch, with the two stale
    tableau touches abstracted behind ``fetch_hstrip(h128) ->
    (m_pad, 128)`` and ``fetch_kslab(k8) -> (8, r_pad)``. The in-VMEM
    kernel (``_batch_window_kernel``) slices its resident tableau
    block; the HBM tier (batched_hbm._hbm_window_kernel) DMAs the strip
    and slab on demand — SAME math, byte-identical pivot walks (the
    multi-tile walk-equality tests pin it).

    ``init``/return: (chi, clo, bh, bl, base, w, zh, zl, status, iters,
    stall, bland) — see _batch_window_kernel for shapes/semantics.

    ``fetch_c0strip``: optional ``h128 -> ((1, 128), (1, 128))`` strip
    reader of the ORIGINAL-cost pair rows. When given, init/return
    append the basic-coefficient pair columns (cfh, cfl) ((m_pad, 1),
    cf[k] = c0[base[k]] for valid basics, else 0) and the loop
    maintains them INCREMENTALLY at each pivot (cf[k] = c0[h] — h is
    always a valid row), so the window-boundary exact re-pricing needs
    no per-window take_along_axis gather in the glue.
    """
    i32 = jnp.int32
    big = i32(BIG_INDEX)
    inf = jnp.float32(jnp.inf)
    eps32 = jnp.float32(eps)
    run_i = i32(int(Status.RUNNING))
    opt_i = i32(int(Status.OPTIMAL))
    unb_i = i32(int(Status.UNBOUNDED))

    riota = lax.broadcasted_iota(i32, (1, r_pad), 1)
    miota_s = lax.broadcasted_iota(i32, (m_pad, 1), 0)
    miota_l = lax.broadcasted_iota(i32, (1, m_pad), 1)
    liota_l = lax.broadcasted_iota(i32, (m_pad, L), 1)
    strip_m = lax.broadcasted_iota(i32, (m_pad, 128), 1)
    strip_l = lax.broadcasted_iota(i32, (L, 128), 1)
    # (L, L) identity for the one small row->column turn per pivot (the
    # eta weights come off Ft's sublane slab as a (1, L) row but fold
    # against C as an (L, 1) column); Mosaic has no vector transpose.
    eye_l = (lax.broadcasted_iota(i32, (L, L), 0)
             == lax.broadcasted_iota(i32, (L, L), 1)).astype(jnp.float32)

    def candidates(chi, clo, w, bland):
        """Entering candidate with PAIR-EXACT eligibility (see
        _batch_window_kernel's docstring for the numerics rationale).
        Returns (h, cost pair at h, optimal)."""
        eligible = pair_eligible(chi, clo, eps32) & (riota < i32(r))
        h_b = jnp.min(jnp.where(eligible, riota, big))
        none = h_b == big
        if devex:
            key = jnp.where(eligible, (chi * chi) / w, -inf)
            vmax = jnp.max(key)
            h_d = jnp.min(jnp.where(eligible & (key == vmax), riota, big))
        else:
            kh = jnp.where(eligible, chi, inf)
            vh = jnp.min(kh)
            ath = kh == vh
            kl = jnp.where(ath, clo, inf)
            vl = jnp.min(kl)
            h_d = jnp.min(jnp.where(ath & (kl == vl), riota, big))
        use_b = (bland != 0) & ~none
        h = jnp.where(use_b, h_b, h_d)
        h = jnp.where(none, i32(0), h)     # safe index when optimal
        at_h = riota == h
        mh = jnp.sum(jnp.where(at_h, chi, 0.0))
        ml = jnp.sum(jnp.where(at_h, clo, 0.0))
        return h, mh, ml, none

    def matvec(A, x, ca, cx):
        return lax.dot_general(
            A, x, (((ca,), (cx,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def body(t, carry):
        if fetch_c0strip is None:
            (chi, clo, bh, bl, base, w, zh, zl,
             status, iters, stall, bland) = carry
        else:
            (chi, clo, bh, bl, base, w, zh, zl,
             status, iters, stall, bland, cfh, cfl) = carry
        # Per-PIVOT iteration fuse (not just per-window): without the
        # iters < max_iter term a lane entering its last window can
        # apply up to L-1 pivots past the fuse and report iterations up
        # to max_iter + L - 1, where the vmapped-XLA fallback stops at
        # exactly max_iter (ADVICE r3).
        active = active0 & (status == run_i) & (iters < max_iter0)

        h, mh, ml, optimal = candidates(chi, clo, w, bland)

        # Live entering column a_h = Tt_stale[:, h] - Ft @ C[:, h] as an
        # (m_pad, 1) column: the stale strip comes from the fetcher, the
        # correction is a small (m, L) x (L, 1) matvec against the etas.
        h128 = pl.multiple_of(lax.div(h, i32(128)) * i32(128), 128)
        hmod = lax.rem(h, i32(128))
        tstrip = fetch_hstrip(h128)                       # (m_pad, 128)
        ah_stale = jnp.sum(jnp.where(strip_m == hmod, tstrip, 0.0),
                           axis=1, keepdims=True)         # (m_pad, 1)
        cstrip = C_ref[:, pl.ds(h128, 128)]               # (L, 128)
        c_h = jnp.sum(jnp.where(strip_l == hmod, cstrip, 0.0),
                      axis=1, keepdims=True)              # (L, 1)
        ah = ah_stale - matvec(Ft_ref[:], c_h, 1, 0)      # (m_pad, 1)

        # Min-ratio leaving test in double-f32 PAIR arithmetic (see
        # _batch_window_kernel's docstring).
        mask = ah >= eps32
        # (jnp.any's bool-reduce squeezes through a f64 scalar under x64,
        # which Mosaic cannot lower — reduce in f32 instead.)
        unbounded = jnp.max(jnp.where(mask, jnp.float32(1),
                                      jnp.float32(0))) == 0
        ahs = jnp.where(mask, ah, jnp.float32(1))
        q1r = bh / ahs
        rq1, rq1e = _two_prod(q1r, ahs)
        q2r = (((bh - rq1) - rq1e) + bl) / ahs
        q1 = jnp.where(mask, q1r, inf)
        rmin1 = jnp.min(q1)
        at1 = mask & (q1 == rmin1)
        q2m = jnp.where(at1, q2r, inf)
        rmin2 = jnp.min(q2m)
        k = jnp.min(jnp.where(at1 & (q2m == rmin2), miota_s, big))
        do = active & ~(optimal | unbounded)
        k = jnp.minimum(k, i32(m_pad - 1))

        at_k = miota_s == k                               # (m_pad, 1)
        p = jnp.sum(jnp.where(at_k, ah, 0.0))
        p = jnp.where(do, p, jnp.float32(1))
        bkh = jnp.sum(jnp.where(at_k, bh, 0.0))
        bkl = jnp.sum(jnp.where(at_k, bl, 0.0))

        # Live leaving row colk = Tt_stale[k, :] - F[:, k] @ C: the
        # stale 8-row slab from the fetcher; the eta weights come off
        # Ft's k-slab as a row, turn into a column via the identity
        # matmul, and fold against C on the VPU.
        k8 = lax.div(k, i32(8)) * i32(8)
        slab = fetch_kslab(k8)                            # (8, r_pad)
        sub8 = k8 + lax.broadcasted_iota(i32, (8, r_pad), 0)
        trow = jnp.sum(jnp.where(sub8 == k, slab, 0.0), axis=0,
                       keepdims=True)                     # (1, r_pad)
        fslab = Ft_ref[pl.ds(pl.multiple_of(k8, 8), 8), :]   # (8, L)
        sub8l = k8 + lax.broadcasted_iota(i32, (8, L), 0)
        w_row = jnp.sum(jnp.where(sub8l == k, fslab, 0.0), axis=0,
                        keepdims=True)                    # (1, L)
        wcol = matvec(eye_l, w_row, 1, 1)                 # (L, 1)
        colk = trow - jnp.sum(C_ref[:] * wcol, axis=0,
                              keepdims=True)              # (1, r_pad)

        if devex:
            # Devex weight update (see _batch_window_kernel docstring).
            wh = jnp.sum(jnp.where(riota == h, w, 0.0))
            # min-fold extraction, NOT jnp.sum: under x64 an integer sum
            # accumulates in i64 (even with dtype=int32, which only sets
            # the OUTPUT type), and Mosaic cannot lower 64-bit converts.
            # k matches exactly one lane, whose base is < big.
            lvar = jnp.min(jnp.where(miota_l == k, base, big))
            alpha = colk / p
            w2 = jnp.maximum(w, alpha * alpha * wh)
            w2 = jnp.where(riota == lvar,
                           jnp.maximum(wh / (p * p), jnp.float32(1)), w2)
            w2 = jnp.minimum(w2, jnp.float32(1e12))
            w2 = jnp.where(w2 == w2, w2, jnp.float32(1))   # NaN -> 1
            w2 = jnp.where(do, w2, w)
        else:
            w2 = w

        # u = minc / p as an exact-residual pair division.
        u1 = mh / p
        ru, reu = _two_prod(u1, p)
        u2 = (((mh - ru) - reu) + ml) / p
        u1 = jnp.where(do, u1, jnp.float32(0))
        u2 = jnp.where(do, u2, jnp.float32(0))

        # costs -= u * colk (pair; u = 0 on a skipped pivot).
        cp1, cp2 = _two_prod(u1, colk)
        cp2 = cp2 + u2 * colk
        cs, ce = _two_sum(chi, -cp1)
        chi2, clo2 = _fast_two_sum(cs, ce + (clo - cp2))
        chi2 = jnp.where(do, chi2, chi)
        clo2 = jnp.where(do, clo2, clo)

        # b pair update (mirrors kernels/blocked._bf_update): factor
        # d = ah / p; b -= bk * d; b[k] = bk / p.
        d1 = ah / p
        rd, red = _two_prod(d1, p)
        d2 = ((ah - rd) - red) / p
        pb1, pbe = _two_prod(bkh, d1)
        pbe = pbe + (bkh * d2 + bkl * d1)
        sb, eb = _two_sum(bh, -pb1)
        nbh, nbl = _fast_two_sum(sb, eb + (bl - pbe))
        qb1 = bkh / p
        rq, rqe = _two_prod(qb1, p)
        qb2 = (((bkh - rq) - rqe) + bkl) / p
        nbh = jnp.where(at_k, qb1, nbh)
        nbl = jnp.where(at_k, qb2, nbl)
        bh2 = jnp.where(do, nbh, bh)
        bl2 = jnp.where(do, nbl, bl)

        # z -= u * bk (pair).
        zp1, zpe = _two_prod(u1, bkh)
        zpe = zpe + (u1 * bkl + u2 * bkh)
        sz, ez = _two_sum(zh, -zp1)
        zh2, zl2 = _fast_two_sum(sz, (zl - zpe) + ez)
        zh2 = jnp.where(do, zh2, zh)
        zl2 = jnp.where(do, zl2, zl)

        base2 = jnp.where(do & (miota_l == k), h, base)

        status2 = jnp.where(
            active,
            jnp.where(optimal, opt_i,
                      jnp.where(unbounded, unb_i, run_i)),
            status)

        # Anti-cycling policy, identical to solver.anticycling_update.
        improved = jnp.abs(zp1) >= eps32
        stall2 = jnp.where(do, jnp.where(improved, i32(0), stall + 1),
                           stall)
        if bland_static:
            bland2 = i32(1)
        elif threshold is None:
            bland2 = i32(0)
        else:
            bland2 = jnp.where(
                do, jnp.where(improved, i32(0),
                              (stall2 >= i32(threshold)).astype(i32)),
                bland)

        # Eta writes: colk into C's 8-row slab around row t (dynamic
        # 8-aligned sublane store), v into Ft's COLUMN t (a lane-masked
        # full read-modify-write of the small (m_pad, L) Ft).
        # Skipped pivots simply skip the write: the scratch was zeroed,
        # so their eta rows stay zero (the liveness contract).
        @pl.when(do)
        def _write_etas():
            t_ = t.astype(i32)
            t8 = lax.div(t_, i32(8)) * i32(8)
            subt = t8 + lax.broadcasted_iota(i32, (8, 1), 0)
            at_t = subt == t_
            cslab = C_ref[pl.ds(pl.multiple_of(t8, 8), 8), :]
            C_ref[pl.ds(pl.multiple_of(t8, 8), 8), :] = jnp.where(
                at_t, colk, cslab)
            v = jnp.where(at_k, jnp.float32(1) - jnp.float32(1) / p, d1)
            Ft_ref[:] = jnp.where(liota_l == t_, v, Ft_ref[:])

        iters2 = iters + do.astype(i32)
        if fetch_c0strip is None:
            return (chi2, clo2, bh2, bl2, base2, w2, zh2, zl2,
                    status2, iters2, stall2, bland2)

        # Incremental re-pricing coefficients: the entering variable's
        # ORIGINAL cost pair replaces row k's basic coefficient — the
        # same value the glue's take_along_axis gather would fetch from
        # the final base, one 128-lane strip read per pivot instead.
        c0h_s, c0l_s = fetch_c0strip(h128)
        strip_1 = lax.broadcasted_iota(i32, (1, 128), 1)
        v0h = jnp.sum(jnp.where(strip_1 == hmod, c0h_s, 0.0))
        v0l = jnp.sum(jnp.where(strip_1 == hmod, c0l_s, 0.0))
        cfh2 = jnp.where(do & at_k, v0h, cfh)
        cfl2 = jnp.where(do & at_k, v0l, cfl)
        return (chi2, clo2, bh2, bl2, base2, w2, zh2, zl2,
                status2, iters2, stall2, bland2, cfh2, cfl2)

    # int32 loop bounds: Python ints promote to i64 under x64, which the
    # Mosaic lowering cannot convert (infinite _convert_helper recursion).
    return lax.fori_loop(jnp.int32(0), jnp.int32(L), body, init)


def _batch_window_kernel(Tt_in, chi_in, clo_in, bh_in, bl_in, base_in,
                         w_in, scf_in, sci_in, c0h_in, c0l_in,
                         cfh_in, cfl_in,
                         Tt_out, chi_out, clo_out, bh_out, bl_out,
                         base_out, w_out, scf_out, sci_out,
                         cfh_out, cfl_out,
                         C_ref, Ft_ref,
                         *, L, r, m_pad, r_pad, eps, bland_static,
                         threshold, devex, fuse_reprice):
    """One lane's window: up to L deferred eta pivots, tableau in VMEM.

    Refs (one lane's blocks): Tt (m_pad, r_pad) f32 transposed tableau
    (sublane=constraint, lane=variable); cost pair (1, 1, r_pad); b pair
    (m_pad, 1); base (1, 1, m_pad) i32; devex weights w (1, 1, r_pad)
    f32 (carried untouched unless ``devex``); scf SMEM (1, 1, 8) f32
    [z_hi, z_lo]; sci SMEM (1, 1, 8) i32 [status, iters, stall, bland,
    active, max_iter]. ``active`` is precomputed by the glue (status
    RUNNING and under the iteration fuse) so a fuse-frozen lane is never
    pivoted; ``max_iter`` re-gates every in-window pivot so the fuse is
    exact (a lane stops at max_iter, mid-window).
    C_ref (L, r_pad) / Ft_ref (m_pad, L) are the eta-factor scratch
    (Ft TRANSPOSED — eta rows as columns — so the per-pivot v write, the
    a_h correction and the window apply all avoid vector transposes),
    zeroed per lane. All stale-tableau reads go to the INPUT block; the
    output block is written exactly once, by the window apply.

    r5 fused re-pricing (``fuse_reprice``): the ORIGINAL-cost pair rows
    c0h/c0l ((1, 1, r_pad)) and the basic-coefficient pair columns
    cfh/cfl ((m_pad, 1), maintained incrementally by the pivot loop)
    let the window-boundary exact re-pricing run against the
    just-applied OUTPUT block in this same grid step — the coefficient
    fold, the pair subtraction, the premature-optimal reopen
    (pair_eligible) all replicate batch_reprice_pass + the glue's
    arithmetic operation for operation, eliminating one full-tableau
    re-read + a dispatch per window. sci slot 6 carries the glue's
    cadence decision (windows+1 divisible by reprice_every); a window
    ending non-RUNNING re-prices regardless, exactly the glue
    contract.

    Extraction economy: lane-indexed vectors come from 128-lane STRIPS
    at dynamic 128-aligned offsets (pl.ds + multiple_of), never from
    full-tile masked folds — a direct rank-1 variant paying full-tile
    cross-lane reductions per pivot measured 0.27 ms per in-kernel
    pivot, and one-hot MXU matvecs against the full tile 0.41 ms; the
    strip form touches ~3 MB of VMEM per pivot instead of ~20.
    """
    status0 = sci_in[0, 0, 0]
    iters0 = sci_in[0, 0, 1]
    stall0 = sci_in[0, 0, 2]
    bland0 = sci_in[0, 0, 3]
    active0 = sci_in[0, 0, 4] != 0
    max_iter0 = sci_in[0, 0, 5]
    zh0 = scf_in[0, 0, 0]
    zl0 = scf_in[0, 0, 1]

    # Scratch persists across grid steps (lanes) — zero this lane's etas.
    C_ref[:] = jnp.zeros_like(C_ref)
    Ft_ref[:] = jnp.zeros_like(Ft_ref)

    init = (chi_in[0], clo_in[0], bh_in[:], bl_in[:], base_in[0],
            w_in[0], zh0, zl0, status0, iters0, stall0, bland0,
            cfh_in[:], cfl_in[:])
    (chi, clo, bh, bl, base, w, zh, zl,
     status, iters, stall, bland, cfh, cfl) = _window_pivot_loop(
        lambda h128: Tt_in[:, pl.ds(h128, 128)],
        lambda k8: Tt_in[pl.ds(pl.multiple_of(k8, 8), 8), :],
        C_ref, Ft_ref, init, L=L, r=r, m_pad=m_pad, r_pad=r_pad,
        eps=eps, bland_static=bland_static, threshold=threshold,
        devex=devex, active0=active0, max_iter0=max_iter0,
        fetch_c0strip=lambda h128: (c0h_in[0, :, pl.ds(h128, 128)],
                                    c0l_in[0, :, pl.ds(h128, 128)]))

    # Window apply — the ONLY full-tile pass, on the MXU (HIGHEST keeps
    # the exact-f32 contract of apply_window_pass). Inactive lanes have
    # all-zero etas, so this also round-trips their tableau into the
    # output block (every mapped output block must be written).
    Tt_out[:] = Tt_in[:] - lax.dot_general(
        Ft_ref[:], C_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)

    cfh_out[:] = cfh
    cfl_out[:] = cfl

    if fuse_reprice:
        i32 = jnp.int32
        eps32 = jnp.float32(eps)
        run_i = i32(int(Status.RUNNING))
        cadence_hit = sci_in[0, 0, 6] != 0
        do_r = active0 & (cadence_hit | (status != run_i))

        # Pair-accumulated cf @ Tt_out — operation for operation the
        # batch_reprice_pass fold (same 8-sublane grouping, same tree),
        # so the fused and unfused paths stay bit-identical.
        def gbody(g, carry):
            sh, sl = carry
            g8 = g * jnp.int32(8)
            T8 = Tt_out[pl.ds(g8, 8), :]
            c8 = cfh_out[pl.ds(g8, 8), :]
            d8 = cfl_out[pl.ds(g8, 8), :]
            p, pe = _two_prod(c8, T8)
            pe = pe + d8 * T8
            s, e = _two_sum(sh, p)
            return s, sl + (e + pe)

        sh = jnp.zeros((8, r_pad), jnp.float32)
        sl = jnp.zeros_like(sh)
        sh, sl = lax.fori_loop(jnp.int32(0), jnp.int32(m_pad // 8),
                               gbody, (sh, sl))
        width = 8
        while width > 1:
            half = width // 2
            s, e = _two_sum(sh[:half], sh[half:width])
            sl = sl[:half] + (e + sl[half:width])
            sh = s
            width = half

        c0h_full = c0h_in[0]
        c0l_full = c0l_in[0]
        s_e, e_e = _two_sum(c0h_full, -sh)
        chi_e, clo_e = _fast_two_sum(s_e, e_e + (c0l_full - sl))

        # Premature-optimal reopen on the kernel's own pair-exact
        # eligibility arithmetic (the glue contract, ADVICE r3).
        riota = lax.broadcasted_iota(i32, (1, r_pad), 1)
        eligible = pair_eligible(chi_e, clo_e, eps32) & (riota < i32(r))
        any_elig = jnp.max(jnp.where(eligible, jnp.float32(1),
                                     jnp.float32(0))) > 0
        premature = do_r & (status == i32(int(Status.OPTIMAL))) & any_elig
        status = jnp.where(premature, run_i, status)
        chi = jnp.where(do_r, chi_e, chi)
        clo = jnp.where(do_r, clo_e, clo)

    chi_out[0] = chi
    clo_out[0] = clo
    bh_out[:] = bh
    bl_out[:] = bl
    base_out[0] = base
    w_out[0] = w
    scf_out[0, 0, 0] = zh
    scf_out[0, 0, 1] = zl
    for j in range(2, 8):
        scf_out[0, 0, j] = jnp.float32(0)
    sci_out[0, 0, 0] = status
    sci_out[0, 0, 1] = iters
    sci_out[0, 0, 2] = stall
    sci_out[0, 0, 3] = bland
    sci_out[0, 0, 4] = sci_in[0, 0, 4]
    sci_out[0, 0, 5] = max_iter0    # preserved: sci rides the solver's
    for j in range(6, 8):           # while-loop carry packed
        sci_out[0, 0, j] = jnp.int32(0)


@functools.partial(
    jax.jit, static_argnames=("L", "r", "eps", "bland_static",
                              "threshold", "devex", "fuse_reprice",
                              "interpret"))
def batch_window_pass(Tt: jax.Array, chi: jax.Array, clo: jax.Array,
                      bh: jax.Array, bl: jax.Array, base: jax.Array,
                      w: jax.Array, scf: jax.Array, sci: jax.Array,
                      c0h: jax.Array, c0l: jax.Array,
                      cfh: jax.Array, cfl: jax.Array,
                      *, L: int, r: int, eps: float,
                      bland_static: bool, threshold: int | None,
                      devex: bool = False, fuse_reprice: bool = False,
                      interpret: bool = False):
    """Run one window (up to L pivots per lane) of the batched in-VMEM
    solve. Grid = (B,): one grid step per lane, whole tableau resident.

    Args (B lanes; the batch folds into the sublane axis of the tableau
    and the column vectors, and rides a size-1 middle dim on the lane
    vectors): Tt (B*m_pad, r_pad) f32 transposed tableaus; cost pair
    chi/clo (B, r_pad) f32; b pair bh/bl (B, m_pad) f32 (reshaped to
    (B*m_pad, 1) columns internally); base (B, m_pad) i32; devex
    weights w (B, r_pad) f32 (pass ones and devex=False under
    Dantzig/Bland — carried through untouched); scf (B, 8) f32
    [z_hi, z_lo]; sci (B, 8) i32 [status, iters, stall, bland,
    active, max_iter, cadence_hit]. c0h/c0l (B, r_pad) f32 are the
    pre-split ORIGINAL-cost pair (read-only; drive the incremental
    basic-coefficient columns cfh/cfl (B, m_pad) and — with
    ``fuse_reprice`` — the in-kernel window-boundary re-pricing +
    premature-optimal reopen, replacing the separate
    batch_reprice_pass dispatch). Static: L window length (multiple of
    8 — the eta-slab stores), r valid-row limit, eps, the pricing
    policy, fuse_reprice.

    Returns the same nine arrays updated plus (cfh, cfl) (Tt, chi,
    clo, bh, bl, base, w, cfh, cfl aliased in place; scf/sci fresh).
    """
    bm, r_pad = Tt.shape
    B = sci.shape[0]
    assert bm % B == 0, (bm, B)
    m_pad = bm // B
    assert bh.shape == (B, m_pad) and chi.shape == (B, r_pad), (
        bh.shape, chi.shape)
    assert m_pad % 8 == 0 and L % 8 == 0, (m_pad, L)
    assert r_pad % 128 == 0 and m_pad % 128 == 0, (r_pad, m_pad)

    kernel = functools.partial(
        _batch_window_kernel, L=int(L), r=int(r), m_pad=m_pad,
        r_pad=r_pad, eps=float(eps), bland_static=bool(bland_static),
        threshold=None if threshold is None else int(threshold),
        devex=bool(devex), fuse_reprice=bool(fuse_reprice))

    # Mosaic requires the last two block dims divisible by (8, 128) or
    # equal to the array's — per-lane row vectors therefore ride as 3D
    # (B, 1, X) arrays whose (1, X) blocks equal the trailing dims.
    tile = pl.BlockSpec((m_pad, r_pad), lambda b: (b, _i0()),
                        memory_space=pltpu.VMEM)
    rowv = pl.BlockSpec((1, 1, r_pad), lambda b: (b, _i0(), _i0()),
                        memory_space=pltpu.VMEM)
    colv = pl.BlockSpec((m_pad, 1), lambda b: (b, _i0()),
                        memory_space=pltpu.VMEM)
    lanev = pl.BlockSpec((1, 1, m_pad), lambda b: (b, _i0(), _i0()),
                         memory_space=pltpu.VMEM)
    smem8 = pl.BlockSpec((1, 1, 8), lambda b: (b, _i0(), _i0()),
                         memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[tile, rowv, rowv, colv, colv, lanev, rowv, smem8,
                  smem8, rowv, rowv, colv, colv],
        out_specs=[tile, rowv, rowv, colv, colv, lanev, rowv, smem8,
                   smem8, colv, colv],
        out_shape=[
            jax.ShapeDtypeStruct((bm, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6,
                              11: 9, 12: 10},
        scratch_shapes=[pltpu.VMEM((L, r_pad), jnp.float32),
                        pltpu.VMEM((m_pad, L), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            # per window: one MXU apply (+ the fused reprice re-read) +
            # L pivots of O(L*(r+m)) work.
            flops=2 * L * bm * r_pad + 4 * L * L * (r_pad + m_pad) * B,
            bytes_accessed=2 * bm * r_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Tt, chi.reshape(B, 1, r_pad), clo.reshape(B, 1, r_pad),
      bh.reshape(bm, 1), bl.reshape(bm, 1),
      base.reshape(B, 1, m_pad), w.reshape(B, 1, r_pad),
      scf.reshape(B, 1, 8), sci.reshape(B, 1, 8),
      c0h.reshape(B, 1, r_pad), c0l.reshape(B, 1, r_pad),
      cfh.reshape(bm, 1), cfl.reshape(bm, 1))
    (Tt2, chi2, clo2, bh2, bl2, base2, w2, scf2, sci2,
     cfh2, cfl2) = out
    return (Tt2, chi2.reshape(B, r_pad), clo2.reshape(B, r_pad),
            bh2.reshape(B, m_pad), bl2.reshape(B, m_pad),
            base2.reshape(B, m_pad), w2.reshape(B, r_pad),
            scf2.reshape(B, 8), sci2.reshape(B, 8),
            cfh2.reshape(B, m_pad), cfl2.reshape(B, m_pad))


def _batch_reprice_kernel(Tt_ref, chi_ref, clo_ref, flag_ref,
                          hi_out, lo_out, *, m_pad):
    """Pair-accumulated coeffs @ Tt for one lane (see
    kernels/blocked._reprice_kernel — same sublane-group pair fold, whole
    lane tableau as the block); skipped lanes (flag 0) emit zeros."""
    hi_out[:] = jnp.zeros_like(hi_out)
    lo_out[:] = jnp.zeros_like(lo_out)

    @pl.when(flag_ref[0, 0, 0] != 0)
    def _accumulate():
        sh = jnp.zeros((8, Tt_ref.shape[1]), jnp.float32)
        sl = jnp.zeros_like(sh)

        def body(g, carry):
            sh, sl = carry
            g8 = g * jnp.int32(8)
            T8 = Tt_ref[pl.ds(g8, 8), :]
            c8 = chi_ref[pl.ds(g8, 8), :]
            d8 = clo_ref[pl.ds(g8, 8), :]
            p, pe = _two_prod(c8, T8)
            pe = pe + d8 * T8
            s, e = _two_sum(sh, p)
            return s, sl + (e + pe)

        sh, sl = lax.fori_loop(jnp.int32(0), jnp.int32(m_pad // 8), body,
                               (sh, sl))
        width = 8
        while width > 1:
            half = width // 2
            s, e = _two_sum(sh[:half], sh[half:width])
            sl = sl[:half] + (e + sl[half:width])
            sh = s
            width = half
        hi_out[0] = sh
        lo_out[0] = sl


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_reprice_pass(Tt: jax.Array, c_hi: jax.Array, c_lo: jax.Array,
                       flags: jax.Array, interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """Batched ``coeffs @ Tt`` as a double-f32 pair per lane.

    Tt (B*m_pad, r_pad) f32; coeff pair c_hi/c_lo (B*m_pad, 1) f32;
    flags (B,) int32 — lanes with flag 0 skip the accumulation and
    return zeros. Returns (hi, lo), each (B, r_pad) f32.
    """
    bm, r_pad = Tt.shape
    B = flags.shape[0]
    m_pad = bm // B
    assert m_pad % 8 == 0 and bm % B == 0, (bm, B)

    # r-tiled for lanes beyond VMEM residency (the HBM tier): each grid
    # step folds one (m_pad, tile_r) tableau tile over its sublanes;
    # small lanes keep a single full-width tile (identical schedule to
    # the pre-tier kernel).
    from .batched_hbm import APPLY_TILE_BYTES
    from .blocked import pick_tile_div_strict

    tile_r = pick_tile_div_strict(
        r_pad, 128,
        max(128, APPLY_TILE_BYTES // (4 * m_pad) // 128 * 128))
    assert r_pad % tile_r == 0, (r_pad, tile_r)
    tile = pl.BlockSpec((m_pad, tile_r), lambda b, t: (b, t),
                        memory_space=pltpu.VMEM)
    colv = pl.BlockSpec((m_pad, 1), lambda b, t: (b, _i0()),
                        memory_space=pltpu.VMEM)
    rowv = pl.BlockSpec((1, 1, tile_r), lambda b, t: (b, _i0(), t),
                        memory_space=pltpu.VMEM)
    hi, lo = pl.pallas_call(
        functools.partial(_batch_reprice_kernel, m_pad=m_pad),
        grid=(B, r_pad // tile_r),
        in_specs=[tile, colv, colv,
                  pl.BlockSpec((1, 1, 1), lambda b, t: (b, _i0(), _i0()),
                               memory_space=pltpu.SMEM)],
        out_specs=[rowv, rowv],
        out_shape=[jax.ShapeDtypeStruct((B, 1, r_pad), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, r_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=20 * bm * r_pad,
            bytes_accessed=(bm * r_pad + 2 * bm + 2 * B * r_pad) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Tt, c_hi, c_lo, flags.astype(jnp.int32).reshape(B, 1, 1))
    return hi.reshape(B, r_pad), lo.reshape(B, r_pad)
