"""Power-of-two equilibration for extreme-magnitude LPs.

The mixed production mode carries b/costs/z as double-f32 pairs inside
the fused kernels (~2^-48 relative precision but FLOAT32 exponent
range): coefficients beyond ~1e38 or below ~1e-38 overflow/denormal the
pair and the solve aborts NUMERIC (config.py vector_dtype caveat; the
reference, all-f64, tolerates ~1e308 — macro.h:6). This module closes
that range gap: geometric row/column equilibration with scale factors
ROUNDED TO POWERS OF TWO, applied on the host at fill time and unwound
at extraction.

Power-of-two scaling multiplies only fp exponents — every scaled
coefficient is EXACT (no new rounding), so where the unscaled problem
was solvable, the scaled pivot arithmetic sees the same mantissas.
Row scaling (A_i, b_i) * r_i leaves the feasible set identical; column
scaling substitutes x_j = s_j * x'_j (columns and c_j scale by s_j, the
solution unwinds as x = s .* x'). Statuses are invariant: positive row
scaling preserves feasibility exactly, and unboundedness rays scale.

Interaction with refinement (refine.py): the final BASIS is scale-free
data, so ``solve()`` refines against the ORIGINAL f64 problem — the
refined x/objective and all certificates are in original units, no
unwind error at all. Only the raw (non-refined) extraction unwinds by
multiplication.

The eps discipline (reference macro.h:28-42 contract) applies in the
SCALED units — that is the point: equilibration moves knife-edge
magnitudes into the band where the f32/pair eps semantics are
meaningful. Tests pin that reference-contract infeasibility survives
scaling.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from .problem import Problem


class Scaling(NamedTuple):
    """Row/column equilibration record: A' = diag(row) @ A @ diag(col),
    b' = row * b, c' = col * c; unwind x = col * x'."""

    row: np.ndarray    # (m,) powers of two, > 0
    col: np.ndarray    # (n,) powers of two, > 0


def _pow2(scale: np.ndarray) -> np.ndarray:
    """Nearest power of two to 1/scale, safe against zeros/non-finite."""
    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        e = np.round(np.log2(scale))
    e = np.where(np.isfinite(e), e, 0.0)
    return np.exp2(-np.clip(e, -1000, 1000))


def equilibrate(problem: Problem, sweeps: int = 2
                ) -> tuple[Problem, Scaling]:
    """Geometric row/column equilibration (sqrt(max*min) per line,
    the classic dense recipe), factors rounded to powers of two.
    ``sweeps`` alternations of rows-then-columns; 2 is plenty for the
    uniform-random-times-outlier structures the seeded generator plus
    range abuse produces."""
    A = problem.A.astype(np.float64, copy=True)
    b = problem.b.astype(np.float64, copy=True)
    c = problem.c.astype(np.float64, copy=True)
    m, n = A.shape
    row = np.ones(m)
    col = np.ones(n)

    def geo(M, axis):
        absM = np.abs(M)
        mx = absM.max(axis=axis)
        with np.errstate(invalid="ignore"):
            mn = np.where(absM > 0, absM, np.inf).min(axis=axis)
        mn = np.where(np.isfinite(mn), mn, 1.0)
        return np.sqrt(mx * mn)

    for _ in range(int(sweeps)):
        # rows over [A | b]: the right-hand side participates so that a
        # lone huge b_i also normalizes.
        r = _pow2(geo(np.concatenate([A, b[:, None]], axis=1), 1))
        A *= r[:, None]
        b *= r
        row *= r
        s = _pow2(geo(A, 0))
        A *= s[None, :]
        c *= s
        col *= s

    return Problem(A=A, b=b, c=c), Scaling(row=row, col=col)


def unwind_result(result, scaling: Scaling, problem: Problem):
    """Map a SCALED-space SolveResult back to original units: x = col *
    x', objective recomputed as c @ x in f64. Refined results
    (result.refine certified against the ORIGINAL data by the caller)
    pass through untouched — they are already in original units."""
    if result.x is None:
        return result
    x = scaling.col * np.asarray(result.x, np.float64)
    objective = float(problem.c @ x)
    return dataclasses.replace(result, x=x, objective=objective)
