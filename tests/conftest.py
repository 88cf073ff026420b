"""Test harness config: run JAX on a virtual 8-device CPU mesh with x64.

This is the standard JAX fake-backend pattern for testing multi-chip
sharding without hardware (SURVEY.md §4d): the real TPU path is exercised
by bench.py / __graft_entry__.py on hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon boot hook force-selects the TPU backend programmatically, so the
# env var alone is not enough — override via jax.config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402
import sys  # noqa: E402

# Bare `pytest` puts tests/ on sys.path but not the repo root; make
# `import bench` (tests/test_bench.py) work either way.
_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA = pathlib.Path(__file__).resolve().parent.parent / "data" / "examples"


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs_between_modules():
    """Release XLA:CPU executables after each test module.

    The suite compiles ~300 distinct programs (many of them large
    interpret-mode Pallas while-loops) into ONE process; past a
    threshold the accumulated loaded executables nondeterministically
    crash XLA:CPU late in the run — Segfault/Abort inside
    backend_compile_and_load or a jitted call, bisected to the point
    where the suite's compile count grew, not to any code change.
    Dropping references between modules keeps the live-executable
    population bounded; the persistent on-disk compilation cache
    (simplex_tpu/__init__.py) keeps recompiles cheap across modules
    that share programs."""
    yield
    jax.clear_caches()


@pytest.fixture
def small_problem():
    from simplex_tpu import read_problem

    return read_problem(DATA / "smallProblem.txt")


@pytest.fixture
def infeasible_problem():
    from simplex_tpu import read_problem

    return read_problem(DATA / "infeasibleProblem.txt")


def assert_valid_solution(problem, result, tol=1e-6):
    """Property check (SURVEY.md §4c): x feasible and objective consistent."""
    x = result.x
    assert x is not None
    assert (x >= -tol).all(), "negative variable"
    assert (problem.A @ x <= problem.b + tol * (1 + np.abs(problem.b))).all()
    assert abs(problem.c @ x - result.objective) <= tol * (
        1 + abs(result.objective))
