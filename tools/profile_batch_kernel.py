"""Isolate the batched in-VMEM window kernel's cost on TPU.

Times one warm batch_window_pass dispatch (B lanes x L pivots) and one
batch_reprice_pass, at the config-3 shape, plus variants with smaller L
to split fixed-per-window vs per-pivot cost.

Run alone on the TPU: python tools/profile_batch_kernel.py [--batch 32]
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
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--vars", type=int, default=2000)
    parser.add_argument("--constraints", type=int, default=500)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from simplex_tpu.batch import batch_kernel_dims
    from simplex_tpu.config import SolverOptions
    from simplex_tpu.kernels.batched import (batch_reprice_pass,
                                             batch_window_pass)
    from simplex_tpu.kernels.blocked import ff32_from_f64

    log(f"devices: {jax.devices()}")
    B, n, m = args.batch, args.vars, args.constraints
    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        block_pivots=128, eps=1e-5)
    R1, _, M = batch_kernel_dims(n, m, opt)
    r = n + 2 * m
    log(f"B={B} tableau {M} x {R1} ({M * R1 * 4 / 1e6:.1f} MB/lane)")

    rng = np.random.default_rng(0)
    Tt = jnp.asarray(rng.uniform(1, 100, (B * M, R1)).astype(np.float32))
    costs = jnp.asarray(rng.uniform(-100, 0, (B, R1)))
    bvec = jnp.asarray(rng.uniform(1, 100, (B, M)))
    chi, clo = ff32_from_f64(costs)
    bh, bl = ff32_from_f64(bvec)
    base = jnp.tile(jnp.arange(n + m, n + m + M, dtype=jnp.int32)[None],
                    (B, 1))
    scf = jnp.zeros((B, 8), jnp.float32)
    sci = jnp.zeros((B, 8), jnp.int32)
    sci = sci.at[:, 0].set(-10).at[:, 4].set(1)   # RUNNING + active

    def timeit(name, fn, sync, reps=5):
        # Sync via a small-output readback, not block_until_ready on the
        # multi-hundred-MB outputs (axon tunnel wedge; see bench.py).
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        log(f"{name:40s} {dt * 1e3:9.2f} ms")
        return dt

    w = jnp.ones((B, R1), jnp.float32)
    for L in (8, 32, 128):
        for devex in (False, True):
            tag = "devex" if devex else "dantzig"
            dt = timeit(
                f"window pass L={L} {tag} (B={B})",
                lambda L=L, devex=devex: batch_window_pass(
                    Tt, chi, clo, bh, bl, base, w, scf, sci,
                    L=L, r=r, eps=1e-5, bland_static=False, threshold=50,
                    devex=devex),
                sync=lambda out: jax.device_get(out[8]))
            log(f"    -> {dt / (B * L) * 1e6:8.2f} us per lane-pivot, "
                f"{dt / B * 1e3:8.3f} ms per lane-window")

    flags = jnp.ones((B,), jnp.int32)
    timeit("reprice pass", lambda: batch_reprice_pass(
        Tt, bh.reshape(B * M, 1), bl.reshape(B * M, 1), flags),
        sync=lambda out: jax.device_get(out[0][:, :1]))
    print("PROFILE_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
