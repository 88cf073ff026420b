"""Microbenchmark window-apply variants on TPU at the flagship shape.

Compares the XLA expression (Tt - F^T@C, ~24 GB traffic: product
materialised then subtracted) against Pallas kernels with different
grid orders, tile sizes, and MXU precisions, to find the true limiter
(DMA traffic vs MXU passes vs per-step overhead).

Run alone on the TPU: python tools/profile_apply.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from simplex_tpu.kernels.blocked import cdiv

    m_pad, r_pad, L = 10112, 120064, 128
    key = jax.random.key(0)
    ks = jax.random.split(key, 3)
    Tt = jax.random.uniform(ks[0], (m_pad, r_pad), jnp.float32, 0.1, 1.0)
    C = jax.random.uniform(ks[1], (L, r_pad), jnp.float32, 0.1, 1.0)
    F = jax.random.uniform(ks[2], (L, m_pad), jnp.float32, 0.1, 1.0)
    gb = (2 * m_pad * r_pad + L * (m_pad + r_pad)) * 4 / 1e9

    N_APPLIES = 8

    def timeit(name, fn):
        """Time `fn` amortised inside a fori_loop with Tt as a donated
        carry — the context the solver runs it in (standalone jit pays a
        defensive copy for the in/out alias and measures ~3x slower)."""
        def loop(Tt, C, F):
            def body(i, carry):
                Tt, acc = carry
                Tt = fn(Tt, C * (1e-9 * (i + 1)), F)
                return Tt, acc + Tt[0, 0]
            return lax.fori_loop(0, N_APPLIES, body, (Tt, jnp.float32(0)))

        jfn = jax.jit(loop)
        out = jfn(Tt, C, F)
        float(out[1])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(Tt, C, F)
            float(out[1])
            times.append(time.perf_counter() - t0)
        best = min(times) / N_APPLIES
        log(f"{name:44s} {best*1e3:8.2f} ms  ({gb/best:6.0f} GB/s eff)")
        return best

    def xla_apply(Tt, C, F):
        return Tt - lax.dot_general(
            F, C, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def make_pallas(tm, tr, precision, swap_grid, f_resident):
        def kernel(Tt_ref, F_ref, C_ref, out_ref, *, i_ref=None):
            if f_resident:
                i = pl.program_id(1) if swap_grid else pl.program_id(0)
                Fblk = F_ref[:, pl.ds(i * tm, tm)]
            else:
                Fblk = F_ref[:]
            out_ref[:] = Tt_ref[:] - lax.dot_general(
                Fblk, C_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)

        ni, nj = cdiv(m_pad, tm), cdiv(r_pad, tr)
        if swap_grid:
            grid = (nj, ni)
            tt_map = lambda j, i: (i, j)
            f_map = ((lambda j, i: (0, 0)) if f_resident
                     else (lambda j, i: (0, i)))
            c_map = lambda j, i: (0, j)
        else:
            grid = (ni, nj)
            tt_map = lambda i, j: (i, j)
            f_map = ((lambda i, j: (0, 0)) if f_resident
                     else (lambda i, j: (0, i)))
            c_map = lambda i, j: (0, j)
        f_block = (L, m_pad) if f_resident else (L, tm)

        def call(Tt, C, F):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tm, tr), tt_map,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(f_block, f_map,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, tr), c_map,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, tr), tt_map,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m_pad, r_pad),
                                               jnp.float32),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024),
            )(Tt, F, C)
        return call

    P = lax.Precision
    timeit("XLA (HIGHEST, unfused subtract)", xla_apply)
    timeit("pallas 512x4096 HIGHEST i-major",
           make_pallas(512, 4096, P.HIGHEST, False, False))
    timeit("pallas 512x4096 HIGHEST j-major Fres",
           make_pallas(512, 4096, P.HIGHEST, True, True))
    timeit("pallas 512x8192 HIGHEST j-major Fres",
           make_pallas(512, 8192, P.HIGHEST, True, True))
    timeit("pallas 1024x4096 HIGHEST j-major Fres",
           make_pallas(1024, 4096, P.HIGHEST, True, True))
    timeit("pallas 512x4096 DEFAULT j-major Fres",
           make_pallas(512, 4096, P.DEFAULT, True, True))
    timeit("pallas 512x4096 HIGH(bf16x3) j-major Fres",
           make_pallas(512, 4096, P.HIGH, True, True))
    timeit("pallas 632x4096 HIGH(bf16x3) j-major Fres",
           make_pallas(632, 4096, P.HIGH, True, True))
    timeit("pallas 256x4096 HIGHEST j-major Fres",
           make_pallas(256, 4096, P.HIGHEST, True, True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
