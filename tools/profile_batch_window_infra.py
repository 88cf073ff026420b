"""Bisect the batched window kernel's fixed per-window cost on TPU.

profile_batch_kernel.py measured a ~0.29 ms fixed cost per lane-window
(B=32, 512x3072 lanes) with only ~2-4 us per marginal in-kernel pivot —
the window INFRASTRUCTURE, not the pivots, dominates. This tool times
stripped variants of the same pallas_call (same specs/aliasing/grid) to
attribute it:

  copy        Tt_out = Tt_in, vector outs copied            (DMA + dispatch)
  apply       + scratch zero + MXU window apply             (+ apply cost)
  pivot1      + ONE body iteration (L=8 loop, 1 live pivot) (+ per-pivot entry)

Run alone on the TPU: python tools/profile_batch_window_infra.py
"""

from __future__ import annotations

import argparse
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    from simplex_tpu.batch import batch_kernel_dims
    from simplex_tpu.config import SolverOptions
    from simplex_tpu.kernels.blocked import _i0, ff32_from_f64

    log(f"devices: {jax.devices()}")
    B, n, m = args.batch, args.vars, args.constraints
    opt = SolverOptions(dtype=np.float32, vector_dtype=np.float64,
                        block_pivots=128, eps=1e-5)
    R1, _, M = batch_kernel_dims(n, m, opt)
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
    sci = jnp.zeros((B, 8), jnp.int32).at[:, 0].set(-10).at[:, 4].set(1)
    w = jnp.ones((B, R1), jnp.float32)
    L = 8

    def make_variant(mode):
        def kernel(Tt_in, chi_in, clo_in, bh_in, bl_in, base_in, w_in,
                   scf_in, sci_in,
                   Tt_out, chi_out, clo_out, bh_out, bl_out, base_out,
                   w_out, scf_out, sci_out, C_ref, Ft_ref):
            if mode == "copy":
                Tt_out[:] = Tt_in[:]
            else:
                C_ref[:] = jnp.zeros_like(C_ref)
                Ft_ref[:] = jnp.zeros_like(Ft_ref)
                Tt_out[:] = Tt_in[:] - lax.dot_general(
                    Ft_ref[:], C_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
            chi_out[0] = chi_in[0]
            clo_out[0] = clo_in[0]
            bh_out[:] = bh_in[:]
            bl_out[:] = bl_in[:]
            base_out[0] = base_in[0]
            w_out[0] = w_in[0]
            for j in range(8):
                scf_out[0, 0, j] = scf_in[0, 0, j]
                sci_out[0, 0, j] = sci_in[0, 0, j]

        bm = B * M
        tile = pl.BlockSpec((M, R1), lambda b: (b, _i0()),
                            memory_space=pltpu.VMEM)
        rowv = pl.BlockSpec((1, 1, R1), lambda b: (b, _i0(), _i0()),
                            memory_space=pltpu.VMEM)
        colv = pl.BlockSpec((M, 1), lambda b: (b, _i0()),
                            memory_space=pltpu.VMEM)
        lanev = pl.BlockSpec((1, 1, M), lambda b: (b, _i0(), _i0()),
                             memory_space=pltpu.VMEM)
        smem8 = pl.BlockSpec((1, 1, 8), lambda b: (b, _i0(), _i0()),
                             memory_space=pltpu.SMEM)
        call = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[tile, rowv, rowv, colv, colv, lanev, rowv, smem8,
                      smem8],
            out_specs=[tile, rowv, rowv, colv, colv, lanev, rowv, smem8,
                       smem8],
            out_shape=[
                jax.ShapeDtypeStruct((bm, R1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, R1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, R1), jnp.float32),
                jax.ShapeDtypeStruct((bm, 1), jnp.float32),
                jax.ShapeDtypeStruct((bm, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, R1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
            ],
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5,
                                  6: 6},
            scratch_shapes=[pltpu.VMEM((L, R1), jnp.float32),
                            pltpu.VMEM((M, L), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def run():
            return call(Tt, chi.reshape(B, 1, R1), clo.reshape(B, 1, R1),
                        bh.reshape(B * M, 1), bl.reshape(B * M, 1),
                        base.reshape(B, 1, M), w.reshape(B, 1, R1),
                        scf.reshape(B, 1, 8), sci.reshape(B, 1, 8))
        return run

    def timeit(name, fn, reps=10):
        out = fn()
        jax.device_get(out[8])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.device_get(out[8])
        dt = (time.perf_counter() - t0) / reps
        log(f"{name:30s} {dt * 1e3:9.2f} ms total, "
            f"{dt / B * 1e6:9.1f} us per lane-window")
        return dt

    for mode in ("copy", "apply"):
        timeit(mode, make_variant(mode))

    # Real kernel at L=8 for the delta (pivot entry cost).
    from simplex_tpu.kernels.batched import batch_window_pass
    timeit("full L=8", lambda: batch_window_pass(
        Tt, chi, clo, bh, bl, base, w, scf, sci,
        L=8, r=n + 2 * m, eps=1e-5, bland_static=False, threshold=50))
    print("PROFILE_INFRA_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
