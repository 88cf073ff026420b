"""Fast silicon probe for the HBM-tier window kernel.

Compiles and runs hbm_window_pass on TINY shapes directly on the TPU
(the Mosaic lowering runs only there — interpret mode cannot catch
i64/lowering faults, CLAUDE.md), comparing against batch_window_pass
on the same inputs. Seconds per iteration; run this before any long
HBM-tier measurement.

Run alone on the TPU: python tools/probe_hbm_kernel.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from simplex_tpu.kernels.batched import batch_window_pass
    from simplex_tpu.kernels.batched_hbm import hbm_window_pass

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    B, m_pad, r_pad, L = 2, 128, 512, 16
    rng = np.random.default_rng(0)
    Tt = jnp.asarray(rng.uniform(-1, 1, (B * m_pad, r_pad)), jnp.float32)
    chi = jnp.asarray(rng.uniform(-1, 0.5, (B, r_pad)), jnp.float32)
    clo = jnp.zeros((B, r_pad), jnp.float32)
    bh = jnp.asarray(rng.uniform(0.1, 1, (B, m_pad)), jnp.float32)
    bl = jnp.zeros((B, m_pad), jnp.float32)
    base = jnp.tile(jnp.arange(300, 300 + m_pad, dtype=jnp.int32), (B, 1))
    w = jnp.ones((B, r_pad), jnp.float32)
    scf = jnp.zeros((B, 8), jnp.float32)
    sci = (jnp.zeros((B, 8), jnp.int32)
           .at[:, 0].set(-10).at[:, 4].set(1).at[:, 5].set(10000))
    c0h = jnp.asarray(rng.uniform(-1, 1, (B, r_pad)), jnp.float32)
    c0l = jnp.zeros((B, r_pad), jnp.float32)
    cfh = jnp.take_along_axis(c0h, base, axis=1)
    cfl = jnp.zeros((B, m_pad), jnp.float32)
    args = (Tt, chi, clo, bh, bl, base, w, scf, sci, c0h, c0l, cfh, cfl)

    for rule in ("dantzig", "devex", "bland"):
        for fuse in (False, True):
            kw = dict(L=L, r=500, eps=1e-5,
                      bland_static=(rule == "bland"),
                      threshold=50, devex=(rule == "devex"),
                      fuse_reprice=fuse)
            fargs = args
            if fuse:
                fargs = list(args)
                fargs[8] = fargs[8].at[:, 6].set(1)   # cadence_hit
            a = batch_window_pass(*fargs, **kw)
            hbm = hbm_window_pass(*fargs, **kw)
            names = "Tt chi clo bh bl base w scf sci cfh cfl".split()
            for name, x, y in zip(names, a, hbm):
                same = np.array_equal(np.asarray(x), np.asarray(y))
                assert same, (rule, fuse, name)
            print(f"{rule} fuse={fuse}: HBM tier bitwise == VMEM tier "
                  "on silicon", file=sys.stderr, flush=True)
    print("PROBE_HBM_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
