"""Problem model, parsers and writers (reference formats,
problem.cu:20-47,128-139)."""

import io

import numpy as np
import pytest

from simplex_tpu import (Problem, format_problem, read_problem,
                         read_seed_file, write_problem, write_seed_file)


def test_read_small_problem(small_problem):
    p = small_problem
    assert p.vars == 3 and p.constraints == 2
    np.testing.assert_array_equal(p.c, [8, 10, 7])
    np.testing.assert_array_equal(p.A, [[1, 3, 2], [1, 5, 1]])
    np.testing.assert_array_equal(p.b, [10, 8])


def test_read_infeasible_problem(infeasible_problem):
    p = infeasible_problem
    assert p.vars == 3 and p.constraints == 3
    np.testing.assert_array_equal(p.c, [1, -1, 1])
    np.testing.assert_array_equal(p.b, [4, -5, -1])


def test_roundtrip_dense():
    rng = np.random.default_rng(0)
    p = Problem(A=rng.normal(size=(4, 6)), b=rng.normal(size=4),
                c=rng.normal(size=6))
    buf = io.StringIO()
    write_problem(buf, p)
    q = read_problem(io.StringIO(buf.getvalue()))
    np.testing.assert_array_equal(p.A, q.A)
    np.testing.assert_array_equal(p.b, q.b)
    np.testing.assert_array_equal(p.c, q.c)


def test_seed_file_roundtrip(tmp_path):
    f = tmp_path / "seed.txt"
    write_seed_file(f, 1024, 256, 102656, 1, 100)
    # Byte-identical to the vendored reference seed file
    # (data/examples/benchmark_problems/random_1024_256.txt).
    assert f.read_text() == "1024 256 102656 1 100"
    assert read_seed_file(f) == (1024, 256, 102656, 1.0, 100.0)


def test_shape_validation():
    with pytest.raises(ValueError):
        Problem(A=np.zeros((2, 3)), b=np.zeros(3), c=np.zeros(3))
    with pytest.raises(ValueError):
        Problem(A=np.zeros((2, 3)), b=np.zeros(2), c=np.zeros(2))


def test_truncated_file_raises():
    with pytest.raises(ValueError):
        read_problem(io.StringIO("3 2\n1 2 3\n1 1 1"))


def test_format_problem(small_problem):
    # Same rendering as the reference pretty-printer (problem.cu:141-181).
    text = format_problem(small_problem)
    assert text.splitlines()[0] == "max + 8.00 X1 + 10.00 X2 + 7.00 X3 "
    assert "subject to " in text
    assert text.splitlines()[2] == "+ 1.00 X1 + 3.00 X2 + 2.00 X3 <= 10.00"
