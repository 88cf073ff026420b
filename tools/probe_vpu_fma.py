"""Probe whether Mosaic emits a fused multiply-add for ``a*b - x`` on
the TPU VPU.

If it does, the error term of a product can be computed in ONE op
(``err = a*b - x`` with x = a*b rounded) instead of Dekker's ~16-op
no-FMA split — which would cut the pair-accumulation cost of the fused
apply+reprice pass and colk_costs_pass by more than half.

Three candidate formulations are evaluated against the Dekker ground
truth on values whose product error is nonzero:

  1. plain:   err = a * b - x         (compiler may CSE a*b -> 0)
  2. assoc:   err = (a * b) - x  with x loaded from a different ref
  3. neg:     err = jnp.negative(x) + a * b

Run alone on the TPU: python tools/probe_vpu_fma.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from simplex_tpu.kernels.blocked import _two_prod

    def kernel(a_ref, b_ref, dek_ref, plain_ref, neg_ref):
        a = a_ref[:]
        b = b_ref[:]
        x, err = _two_prod(a, b)
        dek_ref[:] = err
        x1 = a * b
        plain_ref[:] = a * b - x1
        neg_ref[:] = jnp.negative(x1) + a * b

    n = 1024
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(0.1, 1.0, (8, n)), jnp.float32)
    b = jnp.asarray(rng.uniform(0.1, 1.0, (8, n)), jnp.float32)

    dek, plain, neg = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((8, n), jnp.float32)] * 3,
    )(a, b)

    dek = np.asarray(dek, np.float64)
    true_err = (np.asarray(a, np.float64) * np.asarray(b, np.float64)
                - np.asarray(a * b, np.float64))
    log(f"dekker matches true f64 error: "
        f"{np.allclose(dek, true_err, atol=0)} "
        f"(max dev {np.abs(dek - true_err).max():.3e})")
    for name, got in (("plain a*b-x", np.asarray(plain, np.float64)),
                      ("neg(x)+a*b", np.asarray(neg, np.float64))):
        exact = np.array_equal(got, true_err)
        zero = not got.any()
        log(f"{name:14s} exact={exact} all_zero={zero} "
            f"max_dev={np.abs(got - true_err).max():.3e}")
    log("verdict: VPU FMA usable for two_prod" if
        np.array_equal(np.asarray(plain, np.float64), true_err) or
        np.array_equal(np.asarray(neg, np.float64), true_err)
        else "verdict: no usable FMA — keep Dekker two_prod")


if __name__ == "__main__":
    main()
