"""Seeded random problem generator.

TPU-native equivalent of the reference's cuRAND generator component
(reference: include/generator.cuh, src/generator.cu:9-32, src/problem.cu:49-126).

The reference derives three sub-seeds from the user seed via C
``srand``/``rand`` (problem.cu:63-67) and then runs counter-based cuRAND
streams: one independent stream per matrix column (generator.cu:15) and per
vector element (generator.cu:29), uniform in ``(min, max]``.

Bit parity with cuRAND is impossible off-GPU and not required — parity is
judged on optimal objective values of regenerated instances (SURVEY.md C3).
This module keeps the *protocol* identical (same sub-seed derivation, same
``(n, m, seed, min, max)`` reproducibility contract, same benchmark seed
formula) and swaps the uniform stream for counter-based NumPy Philox, which
is deterministic across platforms and processes.

A JAX device-side variant is provided for generating huge instances directly
in device memory (the analogue of the reference's on-GPU generation); it uses
the JAX threefry PRNG and therefore draws a *different* (but equally
reproducible) stream than the NumPy path.
"""

from __future__ import annotations

import numpy as np

from .problem import Problem
from .utils.crand import derive_subseeds

#: Default generation range of the reference CLI (main.cu:7-8).
DEFAULT_MIN, DEFAULT_MAX = -100.0, 100.0


def _philox_uniform(seed: int, count: int, lo: float, hi: float) -> np.ndarray:
    bits = np.random.Generator(np.random.Philox(key=seed)).random(
        count, dtype=np.float64)
    return bits * (hi - lo) + lo


def generate_random_problem(
    n_vars: int,
    n_constraints: int,
    seed: int,
    lo: float = DEFAULT_MIN,
    hi: float = DEFAULT_MAX,
    rand_flavor: str = "glibc",
) -> Problem:
    """Generate a random dense LP, reproducible from
    ``(n, m, seed, lo, hi)`` (reference generateRandomProblem,
    problem.cu:49-126).

    Sub-seed fan-out matches problem.cu:63-67: seedOne -> b, seedTwo -> c,
    seedThree -> A. A is drawn in variable-major order, mirroring the
    reference's one-stream-per-variable-column layout (generator.cu:9-21).
    """
    if n_vars <= 0 or n_constraints <= 0:
        raise ValueError("n_vars and n_constraints must be positive")
    seed_b, seed_c, seed_a = derive_subseeds(seed, rand_flavor)
    b = _philox_uniform(seed_b, n_constraints, lo, hi)
    c = _philox_uniform(seed_c, n_vars, lo, hi)
    a_cols = _philox_uniform(seed_a, n_vars * n_constraints, lo, hi)
    # Variable-major draw order -> (n, m), transposed to (m, n) storage.
    A = a_cols.reshape(n_vars, n_constraints).T
    return Problem(A=A, b=b, c=c)


def benchmark_seed(n_vars: int, n_constraints: int) -> int:
    """The reference benchmark sweep's seed formula (main.cu:63):
    ``vars*100 + constraints``, +1 for the special-cased 1024x8192 pair."""
    return n_vars * 100 + n_constraints + (
        1 if (n_vars == 1024 and n_constraints == 8192) else 0)


def benchmark_sizes(limit: int = 8192) -> list[tuple[int, int]]:
    """The (vars, constraints) pairs of the reference's ``-t`` sweep
    (main.cu:59-73): powers of two 256..limit in both dimensions,
    constraint-major order."""
    sizes = []
    constraints = 256
    while constraints <= limit:
        n_vars = 256
        while n_vars <= limit:
            sizes.append((n_vars, constraints))
            n_vars *= 2
        constraints *= 2
    return sizes


def generate_random_problem_device(
    n_vars: int,
    n_constraints: int,
    seed: int,
    lo: float = DEFAULT_MIN,
    hi: float = DEFAULT_MAX,
    dtype=None,
):
    """Device-side generation with jax.random (threefry stream; same
    reproducibility contract, different stream than the NumPy path).
    Returns (A, b, c) as jax arrays on the default device."""
    import jax
    import jax.numpy as jnp

    from .config import DEFAULT_OPTIONS

    dtype = dtype or DEFAULT_OPTIONS.dtype
    seed_b, seed_c, seed_a = derive_subseeds(seed)

    @jax.jit
    def gen():
        kb, kc, ka = (jax.random.key(s) for s in (seed_b, seed_c, seed_a))
        b = jax.random.uniform(
            kb, (n_constraints,), dtype=jnp.float32, minval=lo, maxval=hi)
        c = jax.random.uniform(
            kc, (n_vars,), dtype=jnp.float32, minval=lo, maxval=hi)
        A = jax.random.uniform(
            ka, (n_constraints, n_vars), dtype=jnp.float32,
            minval=lo, maxval=hi)
        return (A.astype(dtype), b.astype(dtype), c.astype(dtype))

    return gen()
