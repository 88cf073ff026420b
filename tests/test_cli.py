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


def test_cli_checkpoint_flag_in_process(tmp_path, capsys):
    """--checkpoint PATH runs the resumable solver and reports normally."""
    from simplex_tpu.problem import write_seed_file

    seed_file = tmp_path / "seed.txt"
    write_seed_file(seed_file, 40, 16, 5, 1.0, 100.0)  # A,b,c > 0: bounded
    ck = tmp_path / "state.npz"
    rc = run_cli(["-rf", str(seed_file), "--checkpoint", str(ck),
                  "--checkpoint-every", "5000"], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Problem solved!" in out
    assert not ck.exists(), "checkpoint removed on success"


def test_cli_checkpoint_rejects_timer(tmp_path):
    with pytest.raises(SystemExit, match="incompatible"):
        run_cli(["-r", "10", "5", "1", "--checkpoint",
                 str(tmp_path / "s.npz"), "--timer"], tmp_path)


@pytest.mark.slow
def test_cli_checkpoint_survives_kill9(tmp_path):
    """End-to-end crash recovery: SIGKILL the CLI mid-solve, rerun the
    SAME command, and the solve resumes from the newest checkpoint and
    finishes OPTIMAL (VERDICT: subprocess kill-9-and-resume)."""
    import os
    import subprocess
    import sys
    import time

    from simplex_tpu.generator import benchmark_seed
    from simplex_tpu.problem import write_seed_file

    root = pathlib.Path(__file__).resolve().parent.parent
    seed_file = tmp_path / "seed.txt"
    n, m = 512, 512          # 835 + 22 pivots: several checkpoint windows
    write_seed_file(seed_file, n, m, benchmark_seed(n, m), 1.0, 100.0)
    ck = tmp_path / "state.npz"
    cmd = [sys.executable, "-m", "simplex_tpu.cli", "-rf", str(seed_file),
           "--checkpoint", str(ck), "--checkpoint-every", "200",
           "--platform", "cpu", "--data-dir", str(tmp_path)]

    proc = subprocess.Popen(cmd, cwd=root, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    deadline = time.time() + 300
    while (not ck.exists() and time.time() < deadline
           and proc.poll() is None):
        time.sleep(0.02)
    assert proc.poll() is None, (
        "CLI finished before the first checkpoint window; enlarge the "
        "instance or shrink --checkpoint-every")
    assert ck.exists(), "no checkpoint appeared within the deadline"
    proc.send_signal(9)      # SIGKILL, no cleanup possible
    proc.wait(timeout=60)
    assert ck.exists(), "checkpoint must survive the kill"

    out = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Resuming from checkpoint" in out.stdout
    assert "Problem solved!" in out.stdout
    assert not ck.exists(), "checkpoint removed on success"

    # The resumed optimum matches the oracle on the same instance.
    from simplex_tpu import generate_random_problem, solve_oracle

    want = solve_oracle(generate_random_problem(n, m, benchmark_seed(n, m),
                                                1.0, 100.0))
    line = [l for l in out.stdout.splitlines()
            if l.startswith("Optimal value:")][0]
    got = float(line.split(":")[1])
    assert got == pytest.approx(want.objective, rel=1e-6)


def test_sharded_flag(tmp_path, capsys):
    """--sharded NDEV solves on an NDEV-device 'vars' mesh (conftest
    provides 8 virtual CPU devices) with the standard report contract."""
    rc = run_cli(["-r", "40", "16", "3", "--sharded", "8", "--block", "8"],
                 tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "8-device 'vars' mesh" in out
    assert ("Problem solved!" in out or "UNBOUNDED" in out)
    if "Problem solved!" in out:
        assert (tmp_path / "solution.txt").exists()


def test_fleet_flag(tmp_path, capsys):
    """--batch B --fleet NDEV shards the B instances across an
    NDEV-device 'batch' mesh (r4: multi-device scenario fleets)."""
    rc = run_cli(["-r", "24", "10", "5", "--batch", "8", "--fleet", "4"],
                 tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "across a 4-device fleet" in out
    # Bare -r draws from the reference's [-100, 100] range, so lanes may
    # legitimately be UNBOUNDED — the contract is one report per lane,
    # identical to the unsharded --batch run.
    lines = [l for l in out.splitlines() if l.startswith("seed ")]
    assert len(lines) == 8
    rc2 = run_cli(["-r", "24", "10", "5", "--batch", "8"], tmp_path)
    assert rc2 == 0
    solo = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("seed ")]
    assert lines == solo


def test_fleet_flag_rejections(tmp_path):
    with pytest.raises(SystemExit, match="devices available"):
        run_cli(["-r", "10", "5", "1", "--batch", "4", "--fleet", "999"],
                tmp_path)
    with pytest.raises(ValueError, match="divide"):
        run_cli(["-r", "10", "5", "1", "--batch", "3", "--fleet", "2"],
                tmp_path)
    # --fleet without --batch must fail loudly, not silently solve one
    # instance with no mesh.
    with pytest.raises(SystemExit, match="requires --batch"):
        run_cli(["-r", "10", "5", "1", "--fleet", "2"], tmp_path)


def test_sharded_flag_rejections(tmp_path):
    with pytest.raises(SystemExit, match="incompatible"):
        run_cli(["-r", "10", "5", "1", "--sharded", "2", "--timer"],
                tmp_path)
    with pytest.raises(SystemExit, match="device"):
        run_cli(["-r", "10", "5", "1", "--sharded", "999"], tmp_path)


@pytest.mark.slow
def test_cli_sharded_checkpoint_survives_kill9(tmp_path):
    """Kill-9-and-resume for the SHARDED solver (VERDICT r2 #4): SIGKILL
    the CLI mid-solve on a 4-device mesh, rerun the same command, resume
    from the sharded checkpoint and finish OPTIMAL at the oracle value."""
    import os
    import subprocess
    import sys
    import time

    from simplex_tpu.generator import benchmark_seed
    from simplex_tpu.problem import write_seed_file

    root = pathlib.Path(__file__).resolve().parent.parent
    seed_file = tmp_path / "seed.txt"
    n, m = 512, 512          # 835 + 22 pivots: several checkpoint windows
    write_seed_file(seed_file, n, m, benchmark_seed(n, m), 1.0, 100.0)
    ck = tmp_path / "state.npz"
    cmd = [sys.executable, "-m", "simplex_tpu.cli", "-rf", str(seed_file),
           "--sharded", "4", "--checkpoint", str(ck),
           "--checkpoint-every", "200",
           "--platform", "cpu", "--data-dir", str(tmp_path)]
    # The conftest-set XLA_FLAGS (8 virtual CPU devices) is inherited.
    env = dict(os.environ)

    proc = subprocess.Popen(cmd, cwd=root, env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    deadline = time.time() + 300
    while (not ck.exists() and time.time() < deadline
           and proc.poll() is None):
        time.sleep(0.02)
    assert proc.poll() is None, (
        "CLI finished before the first checkpoint window; enlarge the "
        "instance or shrink --checkpoint-every")
    assert ck.exists(), "no checkpoint appeared within the deadline"
    proc.send_signal(9)      # SIGKILL, no cleanup possible
    proc.wait(timeout=60)
    assert ck.exists(), "checkpoint must survive the kill"

    out = subprocess.run(cmd, cwd=root, env=env, capture_output=True,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Resuming from checkpoint" in out.stdout
    assert "Problem solved!" in out.stdout
    assert not ck.exists(), "checkpoint removed on success"

    from simplex_tpu import generate_random_problem, solve_oracle

    want = solve_oracle(generate_random_problem(n, m, benchmark_seed(n, m),
                                                1.0, 100.0))
    line = [l for l in out.stdout.splitlines()
            if l.startswith("Optimal value:")][0]
    got = float(line.split(":")[1])
    assert got == pytest.approx(want.objective, rel=1e-6)


def test_cli_devex(tmp_path, capsys):
    from simplex_tpu.problem import write_seed_file

    seed_file = tmp_path / "seed.txt"
    write_seed_file(seed_file, 40, 16, 3, 1.0, 100.0)
    rc = main(["-rf", str(seed_file), "--block", "8",
               "--pivot-rule", "devex", "--dtype", "float64",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Problem solved!" in out
