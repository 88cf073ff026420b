"""Batched scenario solving: many independent LPs per call.

North-star extension (BASELINE.json config 3) with no reference
counterpart — the reference solves one LP per process run (main.cu:82-111).

Two device paths:

* **Batched fused kernel** (default on TPU for f32 blocked configs whose
  per-lane tableau fits VMEM): the hot loops run as
  ``kernels/batched.batch_window_pass`` — one Pallas grid step per lane
  keeps the whole tableau VMEM-resident and performs a window of L direct
  rank-1 pivots with pair-f32 vectors, plus a batched pair-accumulation
  re-pricing kernel between windows. The two-phase orchestration around
  the loops (`_solve_device_batched_kernel`) mirrors
  ``two_phase.solve_device`` stage for stage with ``jax.vmap`` on the
  non-loop pieces.
* **Vmapped XLA fallback**: the whole jitted two-phase core
  (two_phase.solve_device) ``jax.vmap``-ed over a leading batch axis;
  statuses are loop-carried data, so lanes that finish early simply stop
  changing state while the shared ``lax.while_loop`` runs until every
  lane is done (the pivot body is idempotent on finished tableaus).
  Used off-TPU, for f64 tableaus, non-blocked configs, and lanes too
  large for VMEM residency.

For multi-device scenario fleets, ``solve_batched`` accepts a mesh and
shards the batch axis across it (one or more LPs per core, pure data
parallelism — no cross-LP communication exists). Eligible configs run
the fused-kernel core per shard under ``shard_map``
(``solve_device_batched_sharded``: each device drives its own in-VMEM
Pallas grid over its local lanes, zero collectives); others fall back
to the vmapped-XLA core, which XLA partitions from the input shardings.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import (DEFAULT_OPTIONS, EPS_REL_F32, SolverOptions, Status,
                     kernel_blocked_eligible, normalize_enabled,
                     refine_enabled)
from .result import SolveResult
from .tableau import (Tableau, build_phase1, count_basic_artificials,
                      extract_solution, gaussian_eliminate,
                      phase1_objective, phase2_reset, round_up)
from .two_phase import DeviceSolveOutput, pivot_out_artificials, solve_device


def batch_kernel_dims(n: int, m: int,
                      options: SolverOptions) -> tuple[int, int, int]:
    """(R1_pad, R2_pad, M_pad) for the batched-kernel path: the variable
    axis is the kernels' LANE axis and must be padded to 128 regardless
    of backend (cf. tableau.padded_dims, which consults the backend)."""
    return (round_up(n + 2 * m, 128), round_up(n + m, 128),
            round_up(m, options.lane_pad))


def batch_window_len(options: SolverOptions) -> int:
    """The in-VMEM kernel's per-grid-step window length L:
    ``batch_block_pivots`` when set, else block_pivots clamped to the
    accuracy-conservative 32 (see solve_loop_batched_kernel). Shared by
    the loop and by the VMEM-fit gate so the gate budgets the same
    L-scaled eta scratch the kernel will allocate."""
    if options.batch_block_pivots is not None:
        return int(options.batch_block_pivots)
    return min(int(options.block_pivots or 1), 32)


def batch_kernel_tier(options: SolverOptions, n: int, m: int) -> str | None:
    """Which batched fused-kernel tier a (n, m) lane shape gets:
    'vmem' (whole tableau VMEM-resident, kernels/batched.py), 'hbm'
    (tableau in HBM, per-pivot strip/slab DMAs — kernels/batched_hbm.py,
    the r5 tier that lifts the 28 MB gate), or None (config ineligible
    or the working set beyond even the HBM tier: vmapped-XLA fallback).
    Backend-independent — callers add the TPU/interpret condition."""
    from .kernels.batched import batch_kernel_fits
    from .kernels.batched_hbm import hbm_tier_fits

    if not kernel_blocked_eligible(options):
        return None
    if (options.batch_block_pivots is None
            and int(options.block_pivots) % 8 != 0):
        return None    # the kernel's eta-slab writes need 8-aligned L
        # (an explicit batch_block_pivots override IS the in-kernel L and
        # is already validated to a multiple of 8, so block_pivots'
        # alignment is then irrelevant)
    R1, _, M = batch_kernel_dims(n, m, options)
    L = batch_window_len(options)
    if batch_kernel_fits(M, R1, L):
        return "vmem"
    if hbm_tier_fits(M, R1, L):
        return "hbm"
    return None


def batch_kernel_enabled(options: SolverOptions, n: int, m: int) -> bool:
    """Whether ``solve_device_batched``'s 'auto' dispatch takes a
    batched fused-kernel path: TPU backend, f32 blocked config (same
    eligibility as the flagship fused kernels, minus their L-alignment
    constraint — the batched kernel has none; all three pricing rules
    run in-kernel, incl. per-lane devex weights), and a lane shape one
    of the two kernel tiers covers (VMEM-resident, or the HBM tier's
    strip-DMA design)."""
    if jax.default_backend() != "tpu":
        return False
    return batch_kernel_tier(options, n, m) is not None


def solve_loop_batched_kernel(tabs: Tableau, options: SolverOptions,
                              max_iter: int,
                              costs0: jax.Array | None = None,
                              interpret: bool = False):
    """Batched deferred-window solve loop on the in-VMEM pivot kernel.

    ``tabs`` is a batched Tableau (leading batch axis on every data
    field; shared static n/m/r). Each ``lax.while_loop`` step dispatches
    one window pass (up to L pivots per lane) with the exact
    window-boundary re-pricing FUSED into the pass itself — the in-VMEM
    tier folds on its resident block, the HBM tier on each just-applied
    tile — under the same cadence/premature-optimal contract as
    solve_loop_blocked_kernel; the premature test evaluates the
    kernel's own pair-exact eligibility arithmetic
    (``kernels.batched.pair_eligible``) on the repriced pair, the ONLY
    representation guaranteed to agree with the in-kernel optimality
    decision for every eps.

    Returns (tabs', status (B,), iterations (B,)); statuses stay RUNNING
    for lanes that hit the per-lane iteration fuse (mapped to MAXITER by
    the caller), and such lanes are frozen (never pivoted again) while
    stragglers finish.
    """
    from .kernels.blocked import ff32_from_f64, ff32_to_f64
    from .kernels.batched import batch_window_pass

    eps = float(options.eps_resolved)
    bland_static = options.pivot_rule_resolved == "bland"
    devex = options.pivot_rule_resolved == "devex"
    assert options.pivot_rule_resolved in ("dantzig", "bland", "devex"), (
        options.pivot_rule_resolved)
    threshold = options.bland_threshold
    # The in-VMEM kernel picks its own window length, default-clamped to
    # 32: the f32 eta-correction noise grows ~sqrt(L) (measured at
    # config-3 shapes: max oracle rel err 3.5e-5 at L=32 vs 1.4e-4 at
    # L=128, reprice cadence irrelevant — the drift rides b and the eta
    # factors, which re-pricing cannot correct). options.batch_block_
    # pivots overrides the clamp: the fixed per-grid-step cost (~0.1-0.2
    # ms of dispatch/DMA-pipeline overhead measured on silicon,
    # tools/profile_batch_alias.py) amortizes over L, so larger windows
    # trade ~sqrt(L) accuracy inside the 5e-4 mixed envelope for
    # wall-clock.
    L = batch_window_len(options)
    reprice_every = max(1, int(options.reprice_every))
    B, R_pad, M_pad = tabs.T.shape
    vdtype = tabs.costs.dtype
    assert tabs.T.dtype == jnp.float32 and R_pad % 128 == 0, (
        tabs.T.dtype, R_pad)
    run_i = jnp.int32(int(Status.RUNNING))

    # Tier dispatch: whole-tableau-in-VMEM window kernel when the lane
    # fits, else the HBM tier (same shared pivot loop, tableau parked in
    # HBM with per-pivot strip/slab DMAs — kernels/batched_hbm.py).
    # BOTH tiers fuse the window-boundary re-pricing + premature-
    # optimal reopen into their own passes (r5: the in-VMEM kernel
    # folds on its resident block; the HBM tier folds on each
    # just-applied tile inside the apply stream) — one full-tableau
    # re-read and one dispatch per window removed everywhere.
    from .kernels.batched import batch_kernel_fits

    if batch_kernel_fits(M_pad, R_pad, L):
        window_fn = batch_window_pass
    else:
        from .kernels.batched_hbm import hbm_window_pass
        window_fn = hbm_window_pass
    fused_reprice = costs0 is not None
    window = partial(window_fn, L=L, r=tabs.r, eps=eps,
                     bland_static=bland_static, threshold=threshold,
                     devex=devex, fuse_reprice=fused_reprice,
                     interpret=interpret)

    Tt0 = tabs.T.transpose(0, 2, 1).reshape(B * M_pad, R_pad)
    chi0, clo0 = ff32_from_f64(tabs.costs)
    bh0, bl0 = ff32_from_f64(tabs.b)
    zh0, zl0 = ff32_from_f64(tabs.z)
    if costs0 is not None:
        # Pre-split once; the loop body's re-pricing glue is then pure
        # f32 pair arithmetic (no emulated-f64 ops per window).
        c0h, c0l = ff32_from_f64(costs0)
    else:
        c0h = jnp.zeros((B, R_pad), jnp.float32)
        c0l = jnp.zeros_like(c0h)
    # Initial basic-coefficient pair columns (cf[k] = c0[base[k]] for
    # valid basics): gathered ONCE here; the window kernels maintain
    # them incrementally at each pivot thereafter.
    valid0 = tabs.base < tabs.r
    idx0 = jnp.minimum(tabs.base, R_pad - 1)
    cfh0 = jnp.where(valid0, jnp.take_along_axis(c0h, idx0, axis=1),
                     jnp.float32(0))
    cfl0 = jnp.where(valid0, jnp.take_along_axis(c0l, idx0, axis=1),
                     jnp.float32(0))

    def cond(s):
        (Tt, chi, clo, bh, bl, base, w, scf, sci, cfh, cfl, windows) = s
        status = sci[:, 0]
        iters = sci[:, 1]
        return (jnp.any((status == run_i) & (iters < max_iter))
                & (windows < max_iter))

    def body(s):
        # scf (B, 8) f32 [z_hi, z_lo] and sci (B, 8) i32 [status, iters,
        # stall, bland, active, max_iter] ride the carry PACKED — the
        # kernel's own operand layout — so the per-window glue writes two
        # small columns instead of re-stacking eight (B,) vectors and
        # re-slicing six on every window.
        (Tt, chi, clo, bh, bl, base, w, scf, sci, cfh, cfl, windows) = s
        active = (sci[:, 0] == run_i) & (sci[:, 1] < max_iter)
        sci_in = sci.at[:, 4].set(active.astype(jnp.int32))
        cadence_hit = lax.rem(windows + 1,
                              jnp.int32(reprice_every)) == 0
        sci_in = sci_in.at[:, 6].set(
            jnp.full((B,), cadence_hit.astype(jnp.int32)))

        (Tt2, chi2, clo2, bh2, bl2, base2, w2, scf2, sci2,
         cfh2, cfl2) = window(
            Tt, chi, clo, bh, bl, base, w, scf, sci_in, c0h, c0l,
            cfh, cfl)
        if devex:
            # Re-anchor the devex reference framework once per window
            # per lane when the weights drift too far — the single-chip
            # fused-kernel loop's cadence (solver.py solve_loop_blocked_
            # kernel.outer; the per-update 1e12 cap inside the kernel
            # bounds mid-window overflow).
            w2 = jnp.where(jnp.max(w2, axis=1, keepdims=True) > 1e8,
                           jnp.ones_like(w2), w2)

        return (Tt2, chi2, clo2, bh2, bl2, base2, w2, scf2, sci2,
                cfh2, cfl2, windows + 1)

    sci0 = jnp.zeros((B, 8), jnp.int32)
    sci0 = sci0.at[:, 0].set(run_i)
    sci0 = sci0.at[:, 3].set(jnp.int32(1 if bland_static else 0))
    sci0 = sci0.at[:, 5].set(jnp.int32(max_iter))
    scf0 = jnp.zeros((B, 8), jnp.float32)
    scf0 = scf0.at[:, 0].set(zh0).at[:, 1].set(zl0)
    init = (Tt0, chi0, clo0, bh0, bl0, tabs.base,
            jnp.ones((B, R_pad), jnp.float32), scf0, sci0,
            cfh0, cfl0, jnp.zeros((), jnp.int32))
    (Tt, chi, clo, bh, bl, base, _w, scf, sci, _cfh, _cfl,
     _windows) = lax.while_loop(cond, body, init)
    zh, zl = scf[:, 0], scf[:, 1]
    status, iters = sci[:, 0], sci[:, 1]

    out = dataclasses.replace(
        tabs,
        T=Tt.reshape(B, M_pad, R_pad).transpose(0, 2, 1),
        b=ff32_to_f64(bh, bl, vdtype),
        costs=ff32_to_f64(chi, clo, vdtype),
        z=ff32_to_f64(zh, zl, vdtype),
        base=base)
    return out, status, iters


def run_solve_loop_batched(tabs: Tableau, options: SolverOptions,
                           max_iter: int, costs0=None,
                           interpret: bool = False):
    """solve_loop_batched_kernel with the per-lane scale-aware pricing
    of solver.run_solve_loop (normalize_costs: divide each lane's
    working costs/z/costs0 by max(1, EPS_REL_F32/eps * (1 + max|costs|))
    for the duration of the loop; positive scaling never changes an
    argmin, so only the pricing/improvement discipline is affected)."""
    scale = None
    if normalize_enabled(options):
        cmax = jnp.max(jnp.abs(tabs.costs), axis=1)
        scale = jnp.maximum(
            1.0, (EPS_REL_F32 / float(options.eps_resolved))
            * (1.0 + cmax)).astype(tabs.costs.dtype)
        tabs = dataclasses.replace(tabs, costs=tabs.costs / scale[:, None],
                                   z=tabs.z / scale)
        if costs0 is not None:
            costs0 = costs0 / scale[:, None]

    out, status, iters = solve_loop_batched_kernel(
        tabs, options, max_iter, costs0, interpret=interpret)

    if scale is not None:
        out = dataclasses.replace(out, costs=out.costs * scale[:, None],
                                  z=out.z * scale)
    return out, status, iters


def _solve_device_batched_kernel(A: jax.Array, b: jax.Array, c: jax.Array,
                                 n: int, m: int, options: SolverOptions,
                                 interpret: bool = False
                                 ) -> DeviceSolveOutput:
    """Two-phase orchestration for the batched fused-kernel path — a
    batched mirror of two_phase.solve_device (same stages, statuses and
    guards, reference twoPhaseMethod.cu:385-435), with the non-loop
    stages vmapped and the hot loops on the in-VMEM batch kernels."""
    eps = float(options.eps_resolved)
    max_iter = options.resolved_max_iter(n + 2 * m, m)
    R1, R2, M = batch_kernel_dims(n, m, options)

    inputs_finite = (jnp.isfinite(A).all(axis=(1, 2))
                     & jnp.isfinite(b).all(axis=1)
                     & jnp.isfinite(c).all(axis=1))

    # ---- Phase 1 ----
    tabs = jax.vmap(lambda Ai, bi: build_phase1(Ai, bi, n, m, options,
                                                dims=(R1, M)))(A, b)
    costs0_1 = tabs.costs
    tabs = jax.vmap(gaussian_eliminate)(tabs)
    tabs, status1, iters1 = run_solve_loop_batched(
        tabs, options, max_iter, costs0_1, interpret=interpret)

    z_phase1 = jax.vmap(phase1_objective)(tabs)
    b_scale = 1.0 + jnp.max(jnp.abs(b), axis=1)
    infeasible = z_phase1 <= -eps * b_scale
    n_art = jax.vmap(count_basic_artificials)(tabs)
    degenerate = n_art > 0

    if options.degeneracy == "continue":
        # Fuse-hit lanes excluded (see two_phase.solve_device): their
        # phase-2 result is discarded, and a capped phase 1 leaves up to
        # m basic artificials whose vmapped repair would run hundreds of
        # full-batch-tableau sweeps of discarded work.
        # != RUNNING (see two_phase.solve_device): phase-1 UNBOUNDED
        # lanes' phase-2 results are not discarded.
        repair = (degenerate & ~infeasible
                  & (status1 != int(Status.RUNNING)))
        # The gate must ride INSIDE the repair while-loop's condition:
        # under vmap the lax.cond lowers to select and EXECUTES both
        # branches, so only the in-cond gate actually skips the sweeps.
        tabs = jax.vmap(
            lambda t, d: lax.cond(
                d, lambda ti: pivot_out_artificials(ti, options, gate=d),
                lambda ti: ti, t))(tabs, repair)

    # ---- Phase 2 ----
    tab2 = jax.vmap(lambda t, ci: phase2_reset(t, ci, options,
                                               r2_pad=R2))(tabs, c)
    costs0_2 = tab2.costs
    tab2 = jax.vmap(gaussian_eliminate)(tab2)
    tab2, status2, iters2 = run_solve_loop_batched(
        tab2, options, max_iter, costs0_2, interpret=interpret)

    x = jax.vmap(extract_solution)(tab2)

    # Status resolution — identical to solve_device, per lane.
    fuse1 = status1 == int(Status.RUNNING)
    fuse2 = status2 == int(Status.RUNNING)
    phase1_failed = infeasible | fuse1
    if options.degeneracy == "reference":
        phase1_failed = phase1_failed | degenerate

    status = jnp.where(fuse2, int(Status.MAXITER), status2)
    if options.degeneracy == "reference":
        status = jnp.where(degenerate, int(Status.DEGENERATE), status)
    status = jnp.where(infeasible, int(Status.INFEASIBLE), status)
    status = jnp.where(fuse1, int(Status.MAXITER), status)
    finite = jnp.isfinite(tab2.z) & jnp.isfinite(x).all(axis=1)
    status = jnp.where(finite | phase1_failed, status,
                       int(Status.NUMERIC))
    status = jnp.where(jnp.isfinite(z_phase1), status,
                       int(Status.NUMERIC))
    status = jnp.where(inputs_finite, status, int(Status.NUMERIC))
    status = status.astype(jnp.int32)

    objective_opt = jnp.einsum("bn,bn->b", c.astype(x.dtype), x,
                               precision=lax.Precision.HIGHEST)
    objective = jnp.where(phase1_failed, z_phase1,
                          jnp.where(status2 == int(Status.OPTIMAL),
                                    objective_opt, tab2.z))
    x = jnp.where((status == int(Status.OPTIMAL))[:, None], x,
                  jnp.zeros_like(x))
    iters2 = jnp.where(phase1_failed, 0, iters2)

    return DeviceSolveOutput(status, x, objective,
                             iters1.astype(jnp.int32),
                             iters2.astype(jnp.int32), n_art, tab2.base)


@functools.lru_cache(maxsize=32)
def _fleet_solver(n: int, m: int, mesh: Mesh, options: SolverOptions,
                  interpret: bool):
    """Cached jitted shard_map wrapper — jax.jit caches on function
    identity, so building a fresh wrapper per call would retrace and
    recompile the full two-phase program every invocation (Mesh and
    SolverOptions are both hashable)."""
    axis = mesh.axis_names[0]
    spec = P(axis)
    out_specs = DeviceSolveOutput(*([spec] * len(DeviceSolveOutput._fields)))
    return jax.jit(jax.shard_map(
        partial(_solve_device_batched_kernel, n=n, m=m, options=options,
                interpret=interpret),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=out_specs,
        check_vma=False))


def solve_device_batched_sharded(A: jax.Array, b: jax.Array, c: jax.Array,
                                 n: int, m: int, mesh: Mesh,
                                 options: SolverOptions = DEFAULT_OPTIONS,
                                 interpret: bool = False
                                 ) -> DeviceSolveOutput:
    """Multi-device batched fleet AT KERNEL SPEED: shard the batch axis
    across ``mesh`` (first axis) and run the in-VMEM fused-kernel
    two-phase core per shard under ``jax.shard_map``.

    A scenario fleet is pure data parallelism — no cross-LP value
    exists, so the shard_map body contains ZERO collectives: each device
    runs ``_solve_device_batched_kernel`` on its local lanes (its own
    Pallas grid over its own while_loop; devices simply finish at
    different times). This replaces the previous mesh behavior of
    forcing the vmapped-XLA fallback (the single-device Pallas grid
    could not be auto-partitioned by XLA — shard_map sidesteps that by
    construction)."""
    return _fleet_solver(n, m, mesh, options, interpret)(A, b, c)


@partial(jax.jit, static_argnames=("n", "m", "options", "kernel"))
def solve_device_batched(A: jax.Array, b: jax.Array, c: jax.Array,
                         n: int, m: int,
                         options: SolverOptions = DEFAULT_OPTIONS,
                         kernel: str | bool = "auto"
                         ) -> DeviceSolveOutput:
    """Batched two-phase solve: ``A (B, m, n)``, ``b (B, m)``, ``c (B, n)``
    -> DeviceSolveOutput with a leading batch axis on every field.

    ``kernel``: 'auto' takes the batched in-VMEM Pallas path when
    eligible (see batch_kernel_enabled); True forces it; 'interpret'
    forces it with interpret-mode kernels (CPU tests); False forces the
    vmapped-XLA fallback — where the flagship fused-pivot passes are
    disabled (batched lanes would need a batched kernel; the pure-XLA
    loop vmaps cleanly)."""
    if kernel == "auto":
        use_kernel = batch_kernel_enabled(options, n, m)
    else:
        use_kernel = bool(kernel)
    if use_kernel:
        return _solve_device_batched_kernel(
            A, b, c, n, m, options, interpret=(kernel == "interpret"))

    options = dataclasses.replace(options, use_pallas=False)
    fn = partial(solve_device, n=n, m=m, options=options)
    return jax.vmap(fn)(A, b, c)


def solve_batched(problems, options: SolverOptions | None = None,
                  mesh: Mesh | None = None, kernel: str | bool = "auto",
                  **replacements) -> list[SolveResult]:
    """Solve a homogeneous batch of Problems in one device call.

    All problems must share (vars, constraints). With ``mesh`` (first axis
    used), the batch axis is sharded across its devices (the batch size
    must then divide evenly) and eligible configs run the in-VMEM
    fused-kernel core per shard under ``shard_map``
    (solve_device_batched_sharded) — a multi-chip scenario fleet at
    kernel speed, zero collectives.
    """
    options = options or DEFAULT_OPTIONS
    if replacements:
        options = dataclasses.replace(options, **replacements)
    if options.needs_x64:
        jax.config.update("jax_enable_x64", True)

    if not problems:
        return []
    n, m = problems[0].vars, problems[0].constraints
    for p in problems:
        if (p.vars, p.constraints) != (n, m):
            raise ValueError(
                f"batch must be homogeneous: got {(p.vars, p.constraints)} "
                f"vs {(n, m)}")

    # Cast A to the tableau dtype ON HOST: build_phase1 converts anyway,
    # and the host->device link may be a tunnel (axon) where shipping
    # f64 for an f32 solve doubles a transfer that can dominate the
    # whole batch solve (measured ~20 s for 256 MB).
    A = jnp.asarray(np.stack([p.A for p in problems]).astype(
        options.dtype, copy=False))
    b = jnp.asarray(np.stack([p.b for p in problems]))
    c = jnp.asarray(np.stack([p.c for p in problems]))

    if mesh is not None:
        axis = mesh.axis_names[0]
        if len(problems) % mesh.shape[axis]:
            raise ValueError(
                f"batch size {len(problems)} must divide across "
                f"{mesh.shape[axis]} devices")
        sharding = NamedSharding(mesh, P(axis))
        A, b, c = (jax.device_put(x, sharding) for x in (A, b, c))
        if kernel == "auto":
            kernel = batch_kernel_enabled(options, n, m)
        if kernel:
            # Fleet at kernel speed: shard_map the in-VMEM fused-kernel
            # core over the batch axis (each device runs its own Pallas
            # grid on its local lanes; zero collectives).
            out = jax.device_get(solve_device_batched_sharded(
                A, b, c, n, m, mesh, options,
                interpret=(kernel == "interpret")))
        else:
            # Vmapped-XLA fallback: XLA partitions the vmapped program
            # from the input shardings alone.
            out = jax.device_get(solve_device_batched(
                A, b, c, n, m, options, kernel=False))
    else:
        out = jax.device_get(solve_device_batched(A, b, c, n, m, options,
                                                  kernel=kernel))

    refine = refine_enabled(options)
    results = []
    for i in range(len(problems)):
        status = Status(int(out.status[i]))
        result = SolveResult(
            status=status,
            x=np.asarray(out.x[i]) if status == Status.OPTIMAL else None,
            objective=float(out.objective[i]),
            iterations_phase1=int(out.iterations_phase1[i]),
            iterations_phase2=int(out.iterations_phase2[i]),
            degenerate=bool(out.n_artificial_in_base[i] > 0),
        )
        if refine and status == Status.OPTIMAL:
            result = _refine_lane(problems[i], out.base[i], options, result)
        results.append(result)
    return results


def _refine_lane(problem, base, options: SolverOptions,
                 result: SolveResult) -> SolveResult:
    """f64 basis refinement for one OPTIMAL batch lane, on the HOST
    (LAPACK f64 against the lane's original problem data — the device
    copy of A was deliberately downcast to the tableau dtype for the
    transfer, see solve_batched). Certificate failure falls back to an
    f64 finishing solve of just that lane."""
    from .refine import RefineInfo, certificates_pass, refine_solution_host
    from .two_phase import fallback_solve

    tol = float(options.refine_tol)
    ro = refine_solution_host(problem.A, problem.b, problem.c,
                              np.asarray(base), problem.vars,
                              problem.constraints)
    ok = ro is not None and certificates_pass(ro, problem.b, problem.c, tol)
    if ok:
        info = RefineInfo(True, float(ro.primal_residual),
                          float(ro.primal_negativity),
                          float(ro.artificial_mass),
                          float(ro.dual_infeasibility), tol,
                          objective_shift=(float(ro.objective)
                                           - result.objective))
        return dataclasses.replace(result, x=np.asarray(ro.x),
                                   objective=float(ro.objective),
                                   refine=info)
    info = RefineInfo(False,
                      float(ro.primal_residual) if ro else float("inf"),
                      float(ro.primal_negativity) if ro else float("inf"),
                      float(ro.artificial_mass) if ro else float("inf"),
                      float(ro.dual_infeasibility) if ro else float("inf"),
                      tol, fallback=True)
    result64 = fallback_solve(problem, options, base=np.asarray(base))
    # Prefer the fallback's own certified RefineInfo when it has one.
    info = (result64.refine or info)._replace(fallback=True)
    return dataclasses.replace(result64, refine=info)
