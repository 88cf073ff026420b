"""Fused Pallas pivot kernel: rank-1 update + cost row + next argmin.

TPU-native replacement for the reference's per-pivot kernel pair
``updateContraintsMatrix`` / ``updateCostsVector`` (reference:
src/solver.cu:34-75) **and** the next iteration's entering-variable argmin
(``minElement``, src/reduction.cu:82-104) in ONE pass over the tableau:

* each grid step owns a (TR, M_pad) row slab of T, applies
  ``T[i, j] -= colk[i] * (a_h[j] / p)`` with the pivot column overwritten
  by ``colk / p`` (the fma update of solver.cu:43-44),
* updates its slab of the reduced-cost vector
  ``costs[i] -= (minc / p) * colk[i]`` (solver.cu:48-56),
* and folds the entering-variable reductions over the *updated* costs —
  the Dantzig (min value, lowest index) pair and the Bland candidate
  (lowest index with cost <= -eps) — into a small VMEM accumulator block
  that every grid step revisits (the TPU sequential-grid accumulator
  pattern; the grid runs in ascending row order, so value ties keep the
  earlier, i.e. lowest, index — same tie rule as ``jnp.argmin``).

This makes one pivot = one fused HBM pass (read T + write T at
speed-of-light); the pure-XLA path pays separate cost-update and argmin
passes, and the reference pays two kernels plus >= 5 host round-trips per
pivot (SURVEY.md §3.2).

The kernel is specialised per (R_pad, M_pad, dtype); runtime scalars
(1/p, minc/p, k) ride in SMEM. Padded rows/columns keep their all-zero
invariant through the update and are masked out of the reductions by the
static real-size bound ``r`` baked into the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Sentinel for "no Bland-eligible variable in this slab".
BIG_INDEX = jnp.iinfo(jnp.int32).max


def _I0():
    """int32 zero for BlockSpec index maps: under jax_enable_x64 a bare
    Python 0 traces as i64, which Mosaic refuses to return from the
    index-map function."""
    return jnp.int32(0)


def _pick_tile_rows(r_pad: int, m_pad: int, itemsize: int,
                    vmem_budget: int = 12 * 1024 * 1024) -> int:
    """Largest power-of-two row-tile whose in+out double-buffered slabs
    fit the VMEM budget and that divides R_pad."""
    tr = 512
    while tr > 8 and 4 * tr * m_pad * itemsize > vmem_budget:
        tr //= 2
    while tr > 1 and r_pad % tr:
        tr //= 2
    return tr


def _kernel(T_ref, costs_ref, colk_ref, factor_ref, scal_ref, k_ref,
            T_out, costs_out, dval_out, didx_out, bval_out, bidx_out,
            acc_val, acc_idx,
            *, tile_rows: int, m_pad: int, r: int, eps: float):
    """Entering-variable reductions fold into SMEM *scratch* accumulators
    (persistent across the sequential grid); the (1,1) SMEM outputs are
    written once on the final step. acc_val: [dantzig_min, bland_val];
    acc_idx: [dantzig_idx, bland_idx]."""
    i = pl.program_id(0)
    inv_p = scal_ref[0, 0]
    minc_over_p = scal_ref[0, 1]
    k = k_ref[0, 0]

    colk = colk_ref[:]                                       # (TR, 1)
    factor = factor_ref[:]                                   # (1, M) = a_h/p
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, m_pad), 1)
    upd = T_ref[:] - colk * factor
    T_out[:] = jnp.where(lane == k, colk * inv_p, upd)

    costs_new = costs_ref[:] - minc_over_p * colk            # (TR, 1)
    costs_out[:] = costs_new

    # All index math pinned to int32: under jax_enable_x64 Python-int
    # constants otherwise become i64, which the Mosaic lowering cannot
    # convert (infinite recursion in its _convert_helper).
    big = jnp.int32(BIG_INDEX)
    gi = i.astype(jnp.int32) * jnp.int32(tile_rows) + \
        jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    cm = jnp.where(gi < jnp.int32(r), costs_new,
                   jnp.asarray(jnp.inf, costs_new.dtype))
    slab_min = jnp.min(cm)
    slab_idx = jnp.min(jnp.where(cm == slab_min, gi, big))
    eligible = cm <= jnp.asarray(-eps, cm.dtype)
    slab_bidx = jnp.min(jnp.where(eligible, gi, big))
    slab_bval = jnp.min(jnp.where(gi == slab_bidx, cm,
                                  jnp.asarray(jnp.inf, cm.dtype)))

    @pl.when(i == 0)
    def _init():
        acc_val[0] = slab_min
        acc_idx[0] = slab_idx
        acc_val[1] = slab_bval
        acc_idx[1] = slab_bidx

    @pl.when(i > 0)
    def _fold():
        # Ascending row order => on value ties keep the earlier index.
        take = slab_min < acc_val[0]
        acc_val[0] = jnp.where(take, slab_min, acc_val[0])
        acc_idx[0] = jnp.where(take, slab_idx, acc_idx[0])
        take_b = slab_bidx < acc_idx[1]
        acc_val[1] = jnp.where(take_b, slab_bval, acc_val[1])
        acc_idx[1] = jnp.where(take_b, slab_bidx, acc_idx[1])

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dval_out[0, 0] = acc_val[0]
        didx_out[0, 0] = acc_idx[0]
        bval_out[0, 0] = acc_val[1]
        bidx_out[0, 0] = acc_idx[1]


@functools.partial(jax.jit, static_argnames=("r", "eps", "interpret"))
def fused_pivot(T: jax.Array, costs: jax.Array, colk: jax.Array,
                a_h: jax.Array, p: jax.Array, minc: jax.Array,
                k: jax.Array, r: int, eps: float,
                do_pivot: jax.Array | None = None,
                interpret: bool = False):
    """One fused pivot pass.

    Args: T (R_pad, M_pad); costs (R_pad,); colk = T[:, k] (R_pad,);
    a_h = T[h] (M_pad,); traced scalars p = a_h[k], minc, k; static r
    (real row count) and eps. When ``do_pivot`` (traced bool) is False the
    pass degrades to the identity (factor=0, 1/p=1, minc/p=0) so the loop
    needs no cond around the kernel — T and costs are aliased in-place
    through the call, keeping peak memory at one tableau.

    Returns (T', costs', h_dantzig, v_dantzig, h_bland, v_bland): the
    entering-variable candidate pairs over the UPDATED costs
    (h_bland == BIG_INDEX, v_bland == +inf when nothing is eligible).
    """
    r_pad, m_pad = T.shape
    dtype = T.dtype
    tr = _pick_tile_rows(r_pad, m_pad, dtype.itemsize)
    grid = r_pad // tr

    if do_pivot is None:
        do_pivot = jnp.asarray(True)
    p_safe = jnp.where(do_pivot, p, jnp.ones_like(p))
    inv_p = jnp.where(do_pivot, (1.0 / p_safe), 1.0).astype(dtype)
    minc_over_p = jnp.where(do_pivot, minc / p_safe, 0.0).astype(dtype)
    scal = jnp.stack([inv_p, minc_over_p]).reshape(1, 2)
    k_arr = jnp.reshape(k, (1, 1)).astype(jnp.int32)
    factor = jnp.where(do_pivot, a_h.astype(dtype) * inv_p,
                       jnp.zeros_like(a_h, dtype)).reshape(1, m_pad)
    costs2 = costs.reshape(r_pad, 1)
    colk2 = colk.reshape(r_pad, 1)

    kernel = functools.partial(_kernel, tile_rows=tr, m_pad=m_pad,
                               r=r, eps=float(eps))
    T_new, costs2_new, dval, didx, bval, bidx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tr, m_pad), lambda i: (i, _I0()),
                         memory_space=pltpu.VMEM),            # T slab
            pl.BlockSpec((tr, 1), lambda i: (i, _I0()),
                         memory_space=pltpu.VMEM),            # costs slab
            pl.BlockSpec((tr, 1), lambda i: (i, _I0()),
                         memory_space=pltpu.VMEM),            # colk slab
            pl.BlockSpec((1, m_pad), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.VMEM),            # factor row
            pl.BlockSpec((1, 2), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.SMEM),            # 1/p, minc/p
            pl.BlockSpec((1, 1), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.SMEM),            # k
        ],
        out_specs=[
            pl.BlockSpec((tr, m_pad), lambda i: (i, _I0()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, _I0()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.SMEM),            # dantzig val
            pl.BlockSpec((1, 1), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.SMEM),            # dantzig idx
            pl.BlockSpec((1, 1), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.SMEM),            # bland val
            pl.BlockSpec((1, 1), lambda i: (_I0(), _I0()),
                         memory_space=pltpu.SMEM),            # bland idx
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, m_pad), dtype),
            jax.ShapeDtypeStruct((r_pad, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), dtype),
            pltpu.SMEM((2,), jnp.int32),
        ],
        input_output_aliases={0: 0, 1: 1},      # T, costs update in place
        cost_estimate=pl.CostEstimate(
            flops=3 * r_pad * m_pad,
            bytes_accessed=2 * r_pad * m_pad * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(T, costs2, colk2, factor, scal, k_arr)

    costs_new = costs2_new.reshape(r_pad)
    return (T_new, costs_new, didx[0, 0], dval[0, 0], bidx[0, 0],
            bval[0, 0])


def entering_candidates(costs: jax.Array, r: int, eps: float):
    """Bootstrap the candidate pairs before the first pivot (plain XLA,
    identical tie semantics to the kernel's folded reductions)."""
    r_pad = costs.shape[0]
    mask = jnp.arange(r_pad) < r
    cm = jnp.where(mask, costs, jnp.inf)
    v_d = jnp.min(cm)
    iota = jnp.arange(r_pad)
    h_d = jnp.min(jnp.where(cm == v_d, iota, BIG_INDEX)).astype(jnp.int32)
    h_b = jnp.min(jnp.where(cm <= -eps, iota, BIG_INDEX)).astype(jnp.int32)
    v_b = jnp.where(h_b < BIG_INDEX, cm[jnp.minimum(h_b, r_pad - 1)],
                    jnp.inf)
    return h_d, v_d, h_b, v_b
