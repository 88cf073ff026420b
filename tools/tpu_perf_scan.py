"""One-process TPU measurement queue for the blocked-loop kernels.

Runs, in order (one process = one tunnel session, minimal compile
round-trips):

  1. VPU-FMA probe (is ``a*b - x`` a fused multiply-add on this VPU?)
  2. fused apply+reprice tile scan (tile_m x tile_r), with and without
     the FMA product-error form if the probe passes
  3. colk_costs_pass scan (tile_r x seg_rows)

All data is generated ON DEVICE (host->device transfers over the axon
tunnel are minutes-slow). Sync via scalar readback only.

Run alone on the TPU: python tools/tpu_perf_scan.py
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
    from jax import lax
    from jax.experimental import pallas as pl

    from simplex_tpu.kernels.blocked import (_two_prod, apply_reprice_pass,
                                             apply_window_pass,
                                             colk_costs_pass)

    # ---- 1. FMA probe -----------------------------------------------
    def fma_kernel(a_ref, b_ref, dek_ref, plain_ref):
        a, b = a_ref[:], b_ref[:]
        x, err = _two_prod(a, b)
        dek_ref[:] = err
        x1 = a * b
        plain_ref[:] = a * b - x1

    rng = np.random.default_rng(7)
    a8 = jnp.asarray(rng.uniform(0.1, 1.0, (8, 1024)), jnp.float32)
    b8 = jnp.asarray(rng.uniform(0.1, 1.0, (8, 1024)), jnp.float32)
    dek, plain = pl.pallas_call(
        fma_kernel,
        out_shape=[jax.ShapeDtypeStruct((8, 1024), jnp.float32)] * 2,
    )(a8, b8)
    true_err = (np.asarray(a8, np.float64) * np.asarray(b8, np.float64)
                - np.asarray(a8 * b8, np.float64))
    dek_ok = np.array_equal(np.asarray(dek, np.float64), true_err)
    fma_ok = np.array_equal(np.asarray(plain, np.float64), true_err)
    log(f"[fma probe] dekker_exact={dek_ok} fma_form_exact={fma_ok} "
        f"(fma max dev {np.abs(np.asarray(plain, np.float64) - true_err).max():.3e})")

    # ---- shared flagship-shape device arrays -------------------------
    # PRODUCTION orientation (solver.solve_loop_blocked_kernel:
    # Tt = tab.T.T): sublane axis = constraints M_pad = 10112, lane
    # axis = variables R_pad = 120064. An earlier version of this tool
    # had them swapped and its numbers did not transfer.
    m_pad, r_pad, L = 10112, 120064, 128
    import jax.random as jr
    ks = jr.split(jr.PRNGKey(0), 6)
    mk = jax.jit(lambda: (
        jr.normal(ks[0], (m_pad, r_pad), jnp.float32),
        jr.normal(ks[1], (L, r_pad), jnp.float32),
        jr.normal(ks[2], (L, m_pad), jnp.float32) * 1e-3,
        jr.normal(ks[3], (m_pad,), jnp.float32),
        jr.normal(ks[4], (r_pad,), jnp.float32),
        jr.normal(ks[5], (r_pad,), jnp.float32) * 1e-8,
    ))
    Tt, C, F, chi_m, chi_r, clo_r = mk()
    clo_m = chi_m * 1e-8
    float(Tt[0, 0])
    log("[setup] device arrays ready")

    gb = (2 * m_pad * r_pad) * 4 / 1e9

    # ---- 2. fused apply+reprice scan ---------------------------------
    W = 6

    def time_window(name, body, reps=3):
        def chain(Tt, C):
            def step(_, carry):
                Tt, C = carry
                Tt = body(Tt, C)
                return Tt, C + 1e-7
            Tt, _ = lax.fori_loop(0, W, step, (Tt, C))
            return Tt
        fn = jax.jit(chain, donate_argnums=0)
        out = fn(Tt + 0, C)
        float(out[0, 0])
        best = np.inf
        for _ in range(reps):
            arg = Tt + 0
            float(arg[0, 0])
            t0 = time.perf_counter()
            out = fn(arg, C)
            float(out[0, 0])
            best = min(best, (time.perf_counter() - t0) / W)
        log(f"[window] {name:44s} {best*1e3:8.2f} ms  {gb/best:6.0f} GB/s(T)")
        return best

    time_window("apply_window_pass (no reprice)",
                lambda Tt, C: apply_window_pass(Tt, C, F))
    # auto tm = pick_tile_div(10112, 8, 896) = 632 (16 tiles, no edge);
    # 1264 = 2*632 also divides; 512 forces the cdiv edge path.
    configs = [(None, None, False), (512, 4096, False),
               (1264, 4096, False), (632, 8192, False)]
    if fma_ok:
        configs += [(None, None, True), (632, 8192, True)]
    for tm, tr, fma in configs:
        label = f"fused tm={tm or 'auto'} tr={tr or 'auto'} fma={fma}"
        try:
            time_window(label,
                        lambda Tt, C, tm=tm, tr=tr, fma=fma:
                        apply_reprice_pass(Tt, C, F, chi_m, clo_m,
                                           tile_m=tm, tile_r=tr,
                                           exact_fma=fma)[0])
        except Exception as e:  # noqa: BLE001
            log(f"[window] {label}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")

    # accuracy spot-check of the fma form against the dekker form
    if fma_ok:
        outs = {}
        for fma in (False, True):
            _, hi, lo = apply_reprice_pass(Tt, C, F, chi_m, clo_m,
                                           exact_fma=fma)
            outs[fma] = (np.asarray(hi, np.float64)
                         + np.asarray(lo, np.float64))
        dev = np.abs(outs[True] - outs[False]).max()
        scale = np.abs(outs[False]).max() + 1.0
        log(f"[accuracy] fma vs dekker reprice max dev {dev:.3e} "
            f"(rel {dev/scale:.3e})")

    # ---- 3. colk scan -------------------------------------------------
    K = 256

    def time_colk(name, tr, seg, reps=3):
        def loop(Tt, C, chi, clo):
            def body(i, carry):
                C, chi, clo, acc = carry
                k = ((i * 7919) ^ jnp.int32(acc) % 997) % m_pad
                t = jnp.int32(L // 2)
                C, chi, clo, h_d, _, _, h_b, _, _ = colk_costs_pass(
                    Tt, C, F, chi, clo, k, t,
                    jnp.float32(1e-9), jnp.float32(0),
                    r=r_pad - 100, eps=1e-5, tile_r=tr, seg_rows=seg)
                return C, chi, clo, acc + h_d
            return lax.fori_loop(0, K, body, (C, chi, clo, jnp.int32(0)))
        fn = jax.jit(loop)
        out = fn(Tt, C, chi_r, clo_r)
        float(out[3])
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(Tt, C, chi_r, clo_r)
            float(out[3])
            best = min(best, (time.perf_counter() - t0) / K)
        log(f"[colk] {name:36s} {best*1e6:8.1f} us/pivot")
        return best

    for tr, seg in ((None, None), (16384, 32), (8192, 64), (16384, 64),
                    (4096, 32)):
        label = f"tr={tr or 'auto'} seg={seg or 'auto'}"
        try:
            time_colk(label, tr, seg)
        except Exception as e:  # noqa: BLE001
            log(f"[colk] {label}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
