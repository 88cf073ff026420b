"""AOT-compile the north-star sharded shape: m=10,000 x n=1,000,000.

Proves the production multi-chip program (parallel/sharded.py: row-sharded
tableau over an 8-device 'vars' mesh, blocked eta-factor pivoting, one
argmin-gather + one psum collective per pivot) traces and compiles at the
full north-star scale (SURVEY.md config 5) without needing 8 real chips:
``jit(...).lower(shapes).compile()`` on the virtual CPU mesh exercises the
whole pipeline except execution. No buffers are allocated (the lowered
tableau alone would be 40 GB).

Run: python tools/aot_northstar.py [--vars 1000000 --constraints 10000]
Prints one JSON line with trace/compile wall times and the collective
counts found in the optimized HLO.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vars", type=int, default=1_000_000)
    ap.add_argument("--constraints", type=int, default=10_000)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--block", type=int, default=128)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from simplex_tpu.config import SolverOptions
    from simplex_tpu.parallel.sharded import make_sharded_solver

    n, m = args.vars, args.constraints
    devices = jax.devices("cpu")[:args.devices]
    assert len(devices) == args.devices
    mesh = Mesh(np.array(devices), ("vars",))
    options = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                            block_pivots=args.block or None)

    fn = make_sharded_solver(mesh, n, m, options)

    A = jax.ShapeDtypeStruct((m, n), jnp.float32)
    b = jax.ShapeDtypeStruct((m,), jnp.float32)
    c = jax.ShapeDtypeStruct((n,), jnp.float32)

    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(A, b, c)
    t_trace = time.perf_counter() - t0
    print(f"traced+lowered in {t_trace:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"compiled in {t_compile:.1f}s", file=sys.stderr, flush=True)

    hlo = compiled.as_text()
    counts = {op: len(re.findall(rf"\b{op}\b", hlo))
              for op in ("all-gather", "all-reduce", "collective-permute",
                         "all-to-all")}
    mem = compiled.memory_analysis()
    out = {
        "shape": f"{m}x{n}",
        "devices": args.devices,
        "block": args.block,
        "trace_s": round(t_trace, 1),
        "compile_s": round(t_compile, 1),
        "collectives": counts,
        "output_bytes": getattr(mem, "output_size_in_bytes", None),
        "temp_bytes": getattr(mem, "temp_size_in_bytes", None),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
