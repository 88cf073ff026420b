"""Scan tile sizes of the fused apply+reprice pass on TPU.

The fused pass is the blocked loop's whole per-window cost (amortized
1/L per pivot). At the flagship shape its ~9.7 GB of tableau read+write
plus ~1.4 GB of C/F block re-reads ran at ~450 GB/s with the original
(512, 4096) tiles vs the chip's ~630 GB/s measured elementwise ceiling.
Levers measured here:

* tile_m: C's block (L, tile_r) is re-fetched once per m-tile, so C
  re-read traffic scales 1/tile_m (235 re-reads at 512 -> 117 at 1024).
* tile_r: F's block (L, tile_m) is re-fetched once per r-tile (minor:
  F re-reads cost ~0.18 GB at tile_r=4096).
* the VPU pair-accumulation chain (serial over tile_m/8 groups) must
  stay hidden under the DMA time.

VMEM bound: double-buffered in+out Tt blocks = 4 * tile_m * tile_r * 4
bytes; (1024, 4096) = 64 MB + C/F blocks fits the 100 MB cap,
(2048, 4096) does not.

Run alone on the TPU: python tools/profile_apply_reprice.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from simplex_tpu.kernels.blocked import (apply_reprice_pass,
                                             apply_window_pass)

    # PRODUCTION orientation: sublanes = constraints M_pad = 10112,
    # lanes = variables R_pad = 120064 (see solve_loop_blocked_kernel).
    m_pad, r_pad, L = 10112, 120064, 128
    # Generate ON device: a 4.85 GB host->device transfer over the axon
    # tunnel can take many minutes (especially right after a wedge).
    import jax.random as jr
    ks = jr.split(jr.PRNGKey(0), 4)
    mk = jax.jit(lambda: (
        jr.normal(ks[0], (m_pad, r_pad), jnp.float32),
        jr.normal(ks[1], (L, r_pad), jnp.float32),
        jr.normal(ks[2], (L, m_pad), jnp.float32) * 1e-3,
        jr.normal(ks[3], (m_pad,), jnp.float32),
    ))
    Tt, C, F, chi = mk()
    clo = chi * 1e-8
    float(Tt[0, 0])
    log("device arrays ready")

    gb = (2 * m_pad * r_pad) * 4 / 1e9  # tableau read+write only

    # W chained calls inside one jit, Tt donated: no defensive copy for
    # the pallas input_output_alias, and per-call Python/dispatch cost
    # amortized. Sync via scalar readback (axon block_until_ready is
    # unreliable). C is nudged between steps so the calls cannot CSE.
    W = 8

    def timeit(name, body, reps=3):
        def chain(Tt, C):
            def step(_, carry):
                Tt, C = carry
                Tt = body(Tt, C)
                return Tt, C + 1e-7
            Tt, _ = jax.lax.fori_loop(0, W, step, (Tt, C))
            return Tt
        fn = jax.jit(chain, donate_argnums=0)
        out = fn(Tt + 0, C)              # compile + warmup (Tt copy!)
        float(out[0, 0])                 # scalar-readback sync
        best = np.inf
        for _ in range(reps):
            arg = Tt + 0
            float(arg[0, 0])
            t0 = time.perf_counter()
            out = fn(arg, C)
            float(out[0, 0])
            best = min(best, (time.perf_counter() - t0) / W)
        log(f"{name:48s} {best*1e3:8.2f} ms   {gb/best:6.0f} GB/s(T)")
        return best

    timeit("apply_window_pass (no reprice, 512x4096)",
           lambda Tt, C: apply_window_pass(Tt, C, F))

    import os
    # tm is the F block's LANE dim: must be a multiple of 128 (632-class
    # divisors fail the Mosaic lowering — see apply_reprice_pass).
    configs = ((896, 4096), (512, 4096), (768, 4096), (1280, 4096),
               (512, 8192))
    if os.environ.get("SCAN_EXTRA"):
        configs += ((896, 2048), (256, 4096), (384, 4096), (640, 4096))
    for tm, tr in configs:
        vmem = 4 * tm * tr * 4 / 2**20
        if vmem > 96:
            log(f"fused tm={tm} tr={tr}: skipped ({vmem:.0f} MB VMEM)")
            continue
        try:
            timeit(f"apply_reprice_pass tm={tm} tr={tr}",
                   lambda Tt, C, tm=tm, tr=tr: apply_reprice_pass(
                       Tt, C, F, chi, clo, tile_m=tm, tile_r=tr)[0])
        except Exception as e:  # noqa: BLE001 - report and continue scan
            log(f"fused tm={tm} tr={tr}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
