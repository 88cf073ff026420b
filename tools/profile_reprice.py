"""Compare window-reprice formulations on TPU at the flagship shape.

The exact re-pricing ``costs0 - coeffs @ Tt`` with f64 accumulation over
the f32 tableau is the blocked loop's hidden cost: XLA emulates the
widening dot by materialising 8x f32 temporaries, so the 4.45 GB read
becomes ~77 GB of traffic (measured 539 ms/window at m=10k x n=100k).
Candidates measured here:

1. current: tableau.accum_matvec (chunked widening dot)
2. cast64: chunk -> astype(f64) -> f64 @ f64 dot (different emulation)
3. delta: u_vec @ C window-delta (f64 over (L, r_pad) only — exact
   w.r.t. the recorded eta rows, leaves colk-rounding drift unreset)
4. pair: double-f32 pair accumulation on the VPU via a Pallas kernel
   (sublane-parallel two_prod/two_sum tree — f64-quality, no 8x temps)

Plus the window-boundary candidate scan (f64 argmin) vs an f32-hi scan.

Run alone on the TPU: python tools/profile_reprice.py
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vars", type=int, default=100_000)
    ap.add_argument("--constraints", type=int, default=10_000)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--windows", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    from simplex_tpu.tableau import accum_matvec, round_up

    n, m, L, W = args.vars, args.constraints, args.block, args.windows
    r_pad = round_up(n + 2 * m, 128)
    m_pad = round_up(m, 128)
    log(f"shape: Tt ({m_pad}, {r_pad}) f32, L={L}, W={W}")

    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    Tt = jax.random.uniform(ks[0], (m_pad, r_pad), jnp.float32, 0.1, 1.0)
    C = jax.random.uniform(ks[1], (L, r_pad), jnp.float32, -1.0, 1.0)
    u_vec = jax.random.uniform(ks[2], (L,), jnp.float64, -1.0, 1.0)
    costs0 = jax.random.uniform(ks[3], (r_pad,), jnp.float64, -1.0, 1.0)
    coeffs = jax.random.uniform(ks[4], (m_pad,), jnp.float64, -1.0, 1.0)

    def timeit(name, fn, *arrs):
        jfn = jax.jit(fn)
        out = jfn(*arrs)
        ref = np.asarray(jax.tree.leaves(out)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*arrs)
            np.asarray(jax.tree.leaves(out)[0].ravel()[0])
            times.append(time.perf_counter() - t0)
        best = min(times) / W * 1e3
        log(f"{name:44s} {best:9.2f} ms/window")
        return ref, best

    def loop(body):
        def run(*arrs):
            def b(i, carry):
                costs, acc = carry
                out = body(costs, i, *arrs)
                return out, acc + out[i % r_pad]
            return lax.fori_loop(0, W, b, (costs0, jnp.float64(0)))
        return run

    # 1. current
    def current(costs, i, Tt, coeffs):
        return costs0 - accum_matvec(Tt, coeffs + 1e-12 * costs[0], 0,
                                     jnp.float64)

    # 2. cast64 chunked
    def cast64(costs, i, Tt, coeffs):
        cc = coeffs + 1e-12 * costs[0]
        chunk = 2048
        out = jnp.zeros((r_pad,), jnp.float64)

        def piece(start, out):
            Tj = lax.dynamic_slice_in_dim(Tt, start, chunk, 1)
            pj = jnp.dot(cc, Tj.astype(jnp.float64),
                         precision=lax.Precision.HIGHEST)
            return lax.dynamic_update_slice_in_dim(out, pj, start, 0)

        out = lax.fori_loop(0, r_pad // chunk,
                            lambda j, o: piece(j * chunk, o), out)
        if r_pad % chunk:
            # overlapping tail chunk, recomputed exactly
            out = piece(r_pad - chunk, out)
        return costs0 - out

    # 3. window delta (not an exact reprice; cost model only)
    def delta(costs, i, C, u_vec):
        uu = u_vec + 1e-12 * costs[0]
        return costs - jnp.dot(uu, C.astype(jnp.float64),
                               precision=lax.Precision.HIGHEST)

    # 4. Pallas pair-accumulation kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from simplex_tpu.kernels.blocked import (_two_prod, _two_sum, cdiv,
                                             pick_tile)

    TM, TR = 512, 8192

    def _reprice_kernel(Tt_ref, chi_ref, clo_ref, hi_out, lo_out):
        i = pl.program_id(1)         # m tile (fastest)

        @pl.when(i == 0)
        def _init():
            hi_out[:] = jnp.zeros_like(hi_out)
            lo_out[:] = jnp.zeros_like(lo_out)

        # (8, TR)-parallel pair accumulation over the tile's sublane
        # groups, folded into the (1, TR) output pair at the end.
        tm = Tt_ref.shape[0]
        sh = jnp.zeros((8, Tt_ref.shape[1]), jnp.float32)
        sl = jnp.zeros_like(sh)

        def body(g, carry):
            sh, sl = carry
            # keep all index math i32 under jax_enable_x64
            g8 = g.astype(jnp.int32) * jnp.int32(8)
            T8 = Tt_ref[pl.ds(g8, 8), :]
            c8 = chi_ref[pl.ds(g8, 8), :]
            d8 = clo_ref[pl.ds(g8, 8), :]
            p, pe = _two_prod(c8, T8)
            pe = pe + d8 * T8
            s, e = _two_sum(sh, p)
            sl = sl + (e + pe)
            return s, sl
        sh, sl = lax.fori_loop(jnp.int32(0), jnp.int32(tm // 8), body,
                               (sh, sl))

        # fold 8 sublanes -> 1 with pair arithmetic (static halving —
        # dynamic sublane indexing of register values is not lowerable)
        width = 8
        while width > 1:
            half = width // 2
            s, e = _two_sum(sh[:half], sh[half:width])
            sl = sl[:half] + (e + sl[half:width])
            sh = s
            width = half
        h1, l1 = sh, sl

        s, e = _two_sum(hi_out[:], h1)
        lo_out[:] = lo_out[:] + (e + l1)
        hi_out[:] = s

    def pair_reprice(Tt, c_hi, c_lo, interpret=False):
        # tm must DIVIDE m_pad: the contraction runs over every sublane
        # of the block, so a cdiv edge block would accumulate
        # out-of-bounds garbage rows into the dot. m_pad is always a
        # multiple of 128 (lane_pad), so 128 always divides.
        tm = next(t for t in (TM, 256, 128) if m_pad % t == 0)
        tr = pick_tile(r_pad, 128, TR)
        grid = (cdiv(r_pad, tr), cdiv(m_pad, tm))
        hi, lo = pl.pallas_call(
            _reprice_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tr), lambda j, i: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda j, i: (i, jnp.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda j, i: (i, jnp.int32(0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tr), lambda j, i: (jnp.int32(0), j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr), lambda j, i: (jnp.int32(0), j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
                       jax.ShapeDtypeStruct((1, r_pad), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(Tt, c_hi, c_lo)
        return hi.reshape(r_pad), lo.reshape(r_pad)

    def pair(costs, i, Tt, coeffs):
        cc = coeffs + 1e-12 * costs[0]
        c_hi = cc.astype(jnp.float32).reshape(m_pad, 1)
        c_lo = (cc - c_hi.reshape(m_pad).astype(jnp.float64)).astype(
            jnp.float32).reshape(m_pad, 1)
        hi, lo = pair_reprice(Tt, c_hi, c_lo)
        return costs0 - (hi.astype(jnp.float64) + lo.astype(jnp.float64))

    # candidates scan variants
    def cand_f64(costs, i, _):
        masked = jnp.where(jnp.arange(r_pad) < n + 2 * m, costs, jnp.inf)
        h = jnp.argmin(masked)
        return costs.at[h].set(costs[h] + 1e-9)

    def cand_f32(costs, i, _):
        hi32 = costs.astype(jnp.float32)
        masked = jnp.where(jnp.arange(r_pad) < n + 2 * m, hi32, jnp.inf)
        h = jnp.argmin(masked)
        return costs.at[h].set(costs[h] + 1e-9)

    r1, _ = timeit("1. accum_matvec (current)", loop(current), Tt, coeffs)
    r2, _ = timeit("2. cast64 chunked f64 dot", loop(cast64), Tt, coeffs)
    r3, _ = timeit("3. u_vec @ C window delta", loop(delta), C, u_vec)
    r4, _ = timeit("4. Pallas double-f32 pair kernel", loop(pair),
                   Tt, coeffs)
    timeit("candidates argmin f64", loop(cand_f64), Tt)
    timeit("candidates argmin f32-hi", loop(cand_f32), Tt)

    err24 = float(np.max(np.abs(r4[0] - r1[0])))
    err22 = float(np.max(np.abs(r2[0] - r1[0])))
    log(f"max|cast64 - current| = {err22:.3e}")
    log(f"max|pair  - current| = {err24:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
