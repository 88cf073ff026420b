"""utils.cuda_order: the reference GPU argmin-order simulator.

Beyond the end-to-end pivot-count parity (test_parity.py), these check
the simulator's contract directly: it must agree with a straightforward
epsilon-aware scan whenever no eps-ties exist, pick *some* eps-tied
minimum when they do, and handle the DBL_MAX masking of the ratio test.
"""

import numpy as np
import pytest

from simplex_tpu.utils.cuda_order import (DBL_MAX, cuda_argmin,
                                          cuda_ratio_argmin)


def naive_eps_argmin(values, eps=1e-9):
    """First-seen minimum under the eps comparator, scanning ascending
    (the tie ORDER differs from the GPU; the tie SET must not)."""
    best_i, best_v = -1, DBL_MAX
    for i, v in enumerate(values):
        if abs(v - best_v) >= eps and v < best_v:
            best_i, best_v = i, v
    return best_i, best_v


@pytest.mark.parametrize("n", [5, 100, 511, 512, 513, 5000, 300_000])
def test_matches_naive_without_ties(n):
    rng = np.random.Generator(np.random.Philox(key=n))
    values = rng.uniform(-1e4, 1e4, n)
    i, v = cuda_argmin(values)
    ni, nv = naive_eps_argmin(values)
    # Unique minimum (continuous draws) -> identical answers.
    assert v == nv
    assert i == ni


@pytest.mark.parametrize("n", [100, 2048, 100_000])
def test_tied_minima_pick_is_in_tie_set(n):
    rng = np.random.Generator(np.random.Philox(key=7 * n))
    values = rng.uniform(10.0, 1e4, n)
    winners = rng.choice(n, size=5, replace=False)
    values[winners] = 1.0 + rng.uniform(0, 0.5e-9, 5)  # eps-tied minima
    i, v = cuda_argmin(values)
    assert i in set(winners)
    assert abs(v - 1.0) < 1e-9


def test_deterministic():
    rng = np.random.Generator(np.random.Philox(key=3))
    values = rng.uniform(-10, 10, 4097)
    values[[5, 1000, 4000]] = values.min() - 1.0  # exact three-way tie
    a = cuda_argmin(values)
    b = cuda_argmin(values.copy())
    assert a == b


def test_ratio_argmin_masks_nonpositive():
    b = np.array([10.0, 1.0, 5.0, 4.0])
    a_h = np.array([1.0, -2.0, 0.0, 2.0])   # only indices 0 and 3 eligible
    k, val = cuda_ratio_argmin(b, a_h)
    assert k == 3 and val == pytest.approx(2.0)


def test_all_masked_returns_sentinel():
    b = np.array([1.0, 2.0])
    a_h = np.array([-1.0, 0.0])
    k, val = cuda_ratio_argmin(b, a_h)
    assert k == -1 and val == DBL_MAX
