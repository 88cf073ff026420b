"""Batched scenario solving benchmark (north-star config 3) on TPU.

256 independent seeded LPs (m=500 constraints x n=2,000 vars each) in
ONE vmapped device call, across solver configurations, with statuses
checked and a few lanes cross-checked against the NumPy oracle.

Run alone on the TPU: python tools/bench_batch.py [--batch 256]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--vars", type=int, default=2000)
    parser.add_argument("--constraints", type=int, default=500)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--config", default=None,
                        help="run only the config whose name contains "
                             "this substring (one TPU process per "
                             "config keeps runs short and killable)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from simplex_tpu.batch import solve_batched
    from simplex_tpu.config import SolverOptions, Status
    from simplex_tpu.generator import generate_random_problem
    from simplex_tpu.oracle import solve_oracle

    log(f"devices: {jax.devices()}")
    n, m, B = args.vars, args.constraints, args.batch
    log(f"generating {B} instances ({n} x {m}, seeds 1000..{1000 + B - 1})")
    problems = [generate_random_problem(n, m, 1000 + i, 1, 100)
                for i in range(B)]

    mixed = dict(dtype=np.float32, vector_dtype=np.float64, eps=1e-5)
    configs = [
        # r4 baselines (dantzig pinned — the pre-r5 default), then the
        # r5 production landscape: devex default + fused in-kernel
        # re-pricing, and the larger in-kernel windows the refinement
        # layer's f64 certificates make safe (accuracy no longer bounds
        # L; drifted lanes self-detect and finish in f64).
        ("kernel L=32 dantzig (r4 baseline)",
         SolverOptions(**mixed, block_pivots=32,
                       pivot_rule="dantzig"), "auto"),
        ("kernel L=32 devex (r5 default)",
         SolverOptions(**mixed, block_pivots=32), "auto"),
        ("kernel L=64 devex",
         SolverOptions(**mixed, block_pivots=128,
                       batch_block_pivots=64), "auto"),
        ("kernel L=128 devex",
         SolverOptions(**mixed, block_pivots=128,
                       batch_block_pivots=128), "auto"),
        ("kernel L=128 dantzig",
         SolverOptions(**mixed, block_pivots=128,
                       batch_block_pivots=128,
                       pivot_rule="dantzig"), "auto"),
        ("vmapped-XLA fallback L=128 devex",
         SolverOptions(**mixed, block_pivots=128), False),
    ]
    # (The vmapped SEQUENTIAL loop is deliberately absent: each pivot
    # streams the whole 1.6 GB batch tableau, ~600x per phase — tens of
    # minutes for a number r1 already established is ~2.5x slower than
    # blocked. Blocked configs are the decision that needs refreshing.)
    if args.config:
        configs = [(n_, o, k) for n_, o, k in configs if args.config in n_]
        assert configs, f"no config matches {args.config!r}"

    import jax
    import jax.numpy as jnp

    from simplex_tpu.batch import solve_device_batched

    # Host->device transfer is timed SEPARATELY: over the axon tunnel,
    # shipping the batch (1 GB f32 at B=256) takes tens of seconds and
    # would otherwise swamp the device-solve comparison. A production
    # fleet ships instances once (or generates on device); the per-call
    # metric that matters is the device solve.
    t0 = time.perf_counter()
    A_host = np.stack([p.A for p in problems]).astype(np.float32)
    b_host = np.stack([p.b for p in problems])
    c_host = np.stack([p.c for p in problems])
    A = jax.device_put(jnp.asarray(A_host))
    bb = jax.device_put(jnp.asarray(b_host))
    cc = jax.device_put(jnp.asarray(c_host))
    jax.block_until_ready((bb, cc))
    float(A[0, 0, 0])
    log(f"[batch] host stack + device transfer "
        f"({A_host.nbytes / 1e6:.0f} MB f32): "
        f"{time.perf_counter() - t0:.1f} s (once per fleet)")

    def run(opt, kern):
        out = solve_device_batched(A, bb, cc, n, m, opt, kernel=kern)
        jax.device_get(out.status)
        return out

    for name, opt, kern in configs:
        t0 = time.perf_counter()
        out = run(opt, kern)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(args.repeats - 1):
            t0 = time.perf_counter()
            out = run(opt, kern)
            times.append(time.perf_counter() - t0)
        best = min(times) if times else warm
        status = np.asarray(out.status)
        n_opt = int((status == int(Status.OPTIMAL)).sum())
        log(f"[batch] {name:40s} {best:8.1f} s "
            f"({best / B * 1e3:6.1f} ms/instance), "
            f"{n_opt}/{B} OPTIMAL (cold {warm:.1f} s)")
        assert n_opt == B, f"{name}: {B - n_opt} lanes not OPTIMAL"

    # Spot-check a few lanes against the oracle through the FULL host
    # surface (solve_batched refines every OPTIMAL lane in f64 now —
    # certified lanes must land at 1e-9; a fallback lane is f64-exact).
    results = solve_batched(problems, configs[-1][1],
                            kernel=configs[-1][2])
    for i in (0, B // 2, B - 1):
        want = solve_oracle(problems[i])
        rel = abs(results[i].objective - want.objective) / (
            1 + abs(want.objective))
        ri = results[i].refine
        log(f"lane {i}: objective rel err {rel:.1e} "
            f"(pivots {results[i].iterations_phase1}"
            f"+{results[i].iterations_phase2}, "
            f"refine={None if ri is None else (ri.certified, ri.fallback)})")
        # certified lanes are 1e-9-class; a fallback lane may settle at
        # the finisher's refine_tol certificate (1e-6 scale-relative).
        bound = 1e-6 if (ri is not None and ri.fallback) else 1e-9
        assert rel < bound, (i, results[i].objective, want.objective)
    print("BENCH_BATCH_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
