"""Batched scenario solving: many independent LPs per call.

North-star extension (BASELINE.json config 3) with no reference
counterpart — the reference solves one LP per process run (main.cu:82-111).
The whole jitted two-phase core (two_phase.solve_device) is ``jax.vmap``-ed
over a leading batch axis of (A, b, c); statuses are loop-carried data, so
lanes that finish early simply stop changing state while the shared
``lax.while_loop`` runs until every lane is done (the pivot body is
idempotent on finished tableaus: an OPTIMAL/UNBOUNDED lane re-derives the
same exit condition and skips its update).

For multi-device scenario fleets, ``solve_batched`` accepts a mesh and
shards the batch axis across it (one or more LPs per core, pure data
parallelism — no cross-LP communication exists).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import DEFAULT_OPTIONS, SolverOptions, Status
from .result import SolveResult
from .two_phase import DeviceSolveOutput, solve_device


@partial(jax.jit, static_argnames=("n", "m", "options"))
def solve_device_batched(A: jax.Array, b: jax.Array, c: jax.Array,
                         n: int, m: int,
                         options: SolverOptions = DEFAULT_OPTIONS
                         ) -> DeviceSolveOutput:
    """vmapped two-phase solve: ``A (B, m, n)``, ``b (B, m)``, ``c (B, n)``
    -> DeviceSolveOutput with a leading batch axis on every field.

    The Pallas fused-pivot path is disabled under vmap (batched lanes
    would need a batched kernel); batched instances are small, and the
    pure-XLA loop vmaps cleanly."""
    options = dataclasses.replace(options, use_pallas=False)
    fn = partial(solve_device, n=n, m=m, options=options)
    return jax.vmap(fn)(A, b, c)


def solve_batched(problems, options: SolverOptions | None = None,
                  mesh: Mesh | None = None, **replacements) -> list[SolveResult]:
    """Solve a homogeneous batch of Problems in one device call.

    All problems must share (vars, constraints). With ``mesh`` (first axis
    used), the batch axis is sharded across its devices; the batch size
    must then divide evenly.
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

    A = jnp.asarray(np.stack([p.A for p in problems]))
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

    out = jax.device_get(solve_device_batched(A, b, c, n, m, options))

    results = []
    for i in range(len(problems)):
        status = Status(int(out.status[i]))
        results.append(SolveResult(
            status=status,
            x=np.asarray(out.x[i]) if status == Status.OPTIMAL else None,
            objective=float(out.objective[i]),
            iterations_phase1=int(out.iterations_phase1[i]),
            iterations_phase2=int(out.iterations_phase2[i]),
            degenerate=bool(out.n_artificial_in_base[i] > 0),
        ))
    return results
