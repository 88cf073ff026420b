"""CLI driver tests (reference main.cu flag contract)."""

import pathlib

import numpy as np
import pytest

from simplex_tpu.cli import main

DATA = pathlib.Path(__file__).resolve().parent.parent / "data" / "examples"


def run_cli(args, tmp_path):
    return main(args + ["--data-dir", str(tmp_path), "--dtype", "float64"])


def test_solve_file(tmp_path, capsys):
    rc = run_cli(["-f", str(DATA / "smallProblem.txt")], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Problem solved!" in out
    # Reference solution-file format (main.cu:104-110).
    sol = (tmp_path / "solution.txt").read_text().splitlines()
    assert sol[0] == "8.000000"
    assert sol[-1] == "Optimal value: 64.000000"


def test_infeasible_file(tmp_path, capsys):
    rc = run_cli(["-f", str(DATA / "infeasibleProblem.txt")], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Problem INFEASIBLE!" in out
    assert not (tmp_path / "solution.txt").exists()


def test_random_with_seed(tmp_path, capsys):
    rc = run_cli(["-r", "30", "12", "99"], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "seed: 99" in out


def test_random_save_seed_file(tmp_path, capsys):
    rc = run_cli(["-rs", "20", "10", "7"], tmp_path)
    assert rc == 0
    saved = list((tmp_path / "examples").glob("random_*.txt"))
    assert len(saved) == 1
    # Reference seed-file format: "n m seed min max" (main.cu:150-152).
    assert saved[0].read_text().split() == ["20", "10", "7", "-100", "100"]


def test_seed_file_roundtrip(tmp_path, capsys):
    rc = run_cli(
        ["-rf", str(DATA / "benchmark_problems" / "random_256_256.txt")],
        tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Problem solved!" in out
    # Golden: objective of the bit-exact regenerated reference instance.
    assert "Optimal value: 5.535474" in out


def test_timer_writes_csv(tmp_path, capsys):
    rc = run_cli(["-r", "30", "12", "5", "--timer"], tmp_path)
    assert rc == 0
    csvs = list((tmp_path / "measures").glob("times_*.txt"))
    assert len(csvs) == 1
    lines = csvs[0].read_text().splitlines()
    assert lines[0] == "vars,contraints,operation,elapsed_time"
    ops = [l.split(",")[2] for l in lines[1:]]
    assert ops[0] == "fillTableau" and "gauss1" in ops


def test_benchmark_sweep_small(tmp_path, capsys):
    rc = main(["-t", "--limit", "256", "--timer", "--data-dir",
               str(tmp_path), "--dtype", "float64"])
    assert rc == 0
    # One benchmark CSV per size (reference initCsvBenchmark naming).
    assert (tmp_path / "measures" / "benchmark_256_256.txt").exists()


def test_batch_mode(tmp_path, capsys):
    rc = run_cli(["-r", "24", "10", "5", "--batch", "4"], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Solving 4 instances" in out
    assert "seed 5:" in out and "seed 8:" in out
