"""The pivot iteration hot loop, jitted.

TPU-native equivalent of the reference's solve loop (reference:
src/solver.cu:78-149) and its reduction primitives (src/reduction.cu).
The entire iteration — entering-variable argmin, unboundedness test,
min-ratio leaving test, rank-1 tableau update — lives inside one
``jax.lax.while_loop``; statuses are loop-carried values, so there are
**zero host round-trips per pivot** (the reference pays >=5 device-to-host
copies plus full device synchronisations per iteration, SURVEY.md §3.2).

Reductions: the reference's warp-shuffle two-pass argmin kernels
(reduction.cu:10-104) and the DBL_MAX-masked ratio-test indicator
(reduction.cu:106-140) become masked ``jnp.argmin`` calls XLA lowers to
on-chip tree reductions; the unboundedness max-reduction
(``isLessOrEqualThanZero``, reduction.cu:143-201) becomes ``jnp.any``.

The rank-1 update (``updateContraintsMatrix`` + ``updateCostsVector``,
solver.cu:34-75) is a single fused elementwise pass over the tableau —
one read + one write of T per pivot, the HBM-bandwidth floor. An optional
Pallas kernel path (kernels/pivot.py) covers what XLA's fusion leaves on
the table.

Beyond the reference: Bland's-rule anti-cycling fallback (activated after
``bland_threshold`` consecutive non-improving pivots, reset on progress)
and an iteration fuse — the reference has neither and can cycle forever
(relazione.Rmd:1037-1039).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .config import SolverOptions, Status
from .tableau import Tableau


class LoopState(NamedTuple):
    tab: Tableau
    status: jax.Array        # int32, Status.RUNNING while iterating
    iterations: jax.Array    # int32
    stall: jax.Array         # int32 consecutive non-improving pivots
    bland: jax.Array         # bool, Bland fallback currently active


def pivot_update(tab: Tableau, h, k, minc, p=None) -> Tableau:
    """Rank-1 pivot update (reference updateTableau, solver.cu:58-75).

    With p = T[h, k], column k of T and b divides by p; every other entry
    gets ``T[i, j] -= (a_h[j] / p) * T[i, k]`` (solver.cu:43, as fma), the
    cost row gets ``costs[i] -= (minc / p) * T[i, k]`` and the objective
    cell ``z -= (minc / p) * b[k]`` (solver.cu:48-56 — colPivot[0] is b[k]
    in the reference's fused layout). The pivot scalar p never leaves the
    device (the reference round-trips it to the host each iteration,
    solver.cu:65-66).
    """
    a_h = tab.T[h]                       # entering column, (M_pad,)
    if p is None:
        p = a_h[k]
    colk = tab.T[:, k]                   # leaving-constraint row, (R_pad,)
    bk = tab.b[k]
    factor = a_h / p
    lane = jnp.arange(tab.cols_padded)
    is_k = lane == k
    T = jnp.where(is_k[None, :], (colk / p)[:, None],
                  tab.T - colk[:, None] * factor[None, :])
    b = jnp.where(is_k, bk / p, tab.b - bk * factor)
    costs = tab.costs - (minc / p) * colk
    z = tab.z - (minc / p) * bk
    base = tab.base.at[k].set(h.astype(tab.base.dtype))
    return dataclasses.replace(tab, T=T, b=b, costs=costs, z=z, base=base)


def choose_entering(tab: Tableau, bland, eps: float):
    """Entering variable (reference minElement over costs, solver.cu:87):
    Dantzig argmin of reduced costs, or — when the Bland fallback is
    active — the lowest index with cost <= -eps. Ties break to the lowest
    index (deterministic; the reference's tie order is its GPU reduction
    order, reduction.cu:10-22 — documented divergence, SURVEY.md §7).

    Returns (h, minc); the caller is optimal iff ``minc > -eps``
    (reference ``compare(minCosts) < 0`` continue-test, solver.cu:88).
    """
    masked = jnp.where(tab.row_mask(), tab.costs, jnp.inf)
    h_dantzig = jnp.argmin(masked)
    eligible = masked <= -eps
    iota = jnp.arange(tab.rows_padded)
    h_bland = jnp.argmin(jnp.where(eligible, iota, tab.rows_padded))
    h = jnp.where(bland & eligible.any(), h_bland, h_dantzig)
    h = h.astype(jnp.int32)
    return h, masked[h]


def ratio_test(tab: Tableau, a_h, eps: float):
    """Leaving constraint (reference createIndicatorsVector + minElement,
    reduction.cu:106-140): argmin of ``b[j] / a_h[j]`` over columns with
    ``a_h[j] >= eps`` (``compare(rowPivot[i]) > 0``), DBL_MAX -> +inf
    elsewhere. Padded columns have a_h == 0 and are masked implicitly.

    Returns (k, unbounded); unbounded iff no eligible column — exactly the
    reference's max <= eps test (``isLessOrEqualThanZero``,
    reduction.cu:186-201).
    """
    mask = a_h >= eps
    unbounded = ~mask.any()
    ratios = jnp.where(mask, tab.b / jnp.where(mask, a_h, 1.0), jnp.inf)
    k = jnp.argmin(ratios).astype(jnp.int32)
    return k, unbounded


def iteration_body(state: LoopState, options: SolverOptions) -> LoopState:
    """One pivot iteration (reference inner solve, solver.cu:78-126):
    entering argmin -> unboundedness test -> min-ratio test -> rank-1
    update, as pure data flow. Shared by the fused ``lax.while_loop``
    driver (solve_loop) and the host-stepped timed driver
    (timed.solve_timed with per_iteration=True). Idempotent once
    OPTIMAL/UNBOUNDED (re-derives the same exit and skips the update),
    which also makes it vmap-safe for lanes that finish early."""
    eps = float(options.eps)
    bland_static = options.pivot_rule == "bland"
    threshold = options.bland_threshold

    tab = state.tab
    h, minc = choose_entering(tab, state.bland, eps)
    optimal = minc > -eps

    a_h = tab.T[h]
    k, unbounded = ratio_test(tab, a_h, eps)
    do_pivot = ~(optimal | unbounded)

    # Guard the division for exit iterations (p could be ~0 garbage).
    p_raw = a_h[k]
    p = jnp.where(do_pivot, p_raw, jnp.ones_like(p_raw))
    new_tab = pivot_update(tab, h, k, minc, p=p)

    tab_out = jax.tree.map(
        lambda new, old: jnp.where(do_pivot, new, old),
        new_tab, tab)

    status = jnp.where(
        optimal, int(Status.OPTIMAL),
        jnp.where(unbounded, int(Status.UNBOUNDED),
                  int(Status.RUNNING))).astype(jnp.int32)

    improved = jnp.abs(tab_out.z - tab.z) >= eps
    stall = jnp.where(do_pivot,
                      jnp.where(improved, 0, state.stall + 1),
                      state.stall).astype(jnp.int32)
    if bland_static:
        bland = jnp.ones((), bool)
    elif threshold is None:
        bland = jnp.zeros((), bool)
    else:
        bland = jnp.where(
            do_pivot,
            jnp.where(improved, False, stall >= threshold),
            state.bland)

    return LoopState(tab_out, status,
                     state.iterations + do_pivot.astype(jnp.int32),
                     stall, bland)


def initial_state(tab: Tableau, options: SolverOptions) -> LoopState:
    return LoopState(tab, jnp.asarray(int(Status.RUNNING), jnp.int32),
                     jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                     jnp.asarray(options.pivot_rule == "bland"))


def solve_loop(tab: Tableau, options: SolverOptions,
               max_iter: int) -> tuple[Tableau, jax.Array, jax.Array]:
    """Run pivots until OPTIMAL / UNBOUNDED / iteration fuse
    (reference outer solve, solver.cu:128-149).

    Returns (tableau, status, iterations); status stays RUNNING if the
    fuse tripped (mapped to MAXITER by the caller).
    """

    def cond(state: LoopState):
        return (state.status == int(Status.RUNNING)) & (
            state.iterations < max_iter)

    final = lax.while_loop(cond, lambda s: iteration_body(s, options),
                           initial_state(tab, options))
    return final.tab, final.status, final.iterations
