"""Attribute the batched window kernel's fixed per-grid-step cost.

Variants of a pure-copy pallas_call over the config-3 lane tile
(B x 512 x 3072 f32), crossing:

  alias     input_output_aliases on the tile (the production choice)
  fresh     no aliasing (separate output buffers)
  x
  tile      only the Tt tile operand
  all9      the production 9-in/9-out operand set

If `alias` is much slower than `fresh`, aliased blocks are defeating
Mosaic's cross-step double buffering (aliased outputs must store to the
same HBM the next step loads, serializing the pipeline) — and the
production while_loop should ping-pong two tableau buffers instead.

Run alone on the TPU: python -u tools/profile_batch_alias.py
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
    args = parser.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from simplex_tpu.kernels.blocked import _i0

    log(f"devices: {jax.devices()}")
    B, M, R1 = args.batch, 512, 3072
    rng = np.random.default_rng(0)
    Tt = jnp.asarray(rng.uniform(1, 100, (B * M, R1)).astype(np.float32))
    rows = [jnp.asarray(rng.uniform(0, 1, (B, 1, R1)).astype(np.float32))
            for _ in range(3)]
    cols = [jnp.asarray(rng.uniform(0, 1, (B * M, 1)).astype(np.float32))
            for _ in range(2)]
    lane = jnp.zeros((B, 1, M), jnp.int32)
    smems = [jnp.zeros((B, 1, 8), jnp.float32),
             jnp.zeros((B, 1, 8), jnp.int32)]

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

    def tile_kernel(Tt_in, Tt_out):
        Tt_out[:] = Tt_in[:]

    def all9_kernel(Tt_in, r1, r2, c1, c2, ln, r3, s1, s2,
                    Tt_out, r1o, r2o, c1o, c2o, lno, r3o, s1o, s2o):
        Tt_out[:] = Tt_in[:]
        r1o[0] = r1[0]
        r2o[0] = r2[0]
        c1o[:] = c1[:]
        c2o[:] = c2[:]
        lno[0] = ln[0]
        r3o[0] = r3[0]
        for j in range(8):
            s1o[0, 0, j] = s1[0, 0, j]
            s2o[0, 0, j] = s2[0, 0, j]

    def make(name, operands, kernel, in_specs, out_shapes, aliases,
             semantics=None):
        params = dict(vmem_limit_bytes=100 * 1024 * 1024)
        if semantics is not None:
            params["dimension_semantics"] = semantics
        call = pl.pallas_call(
            kernel, grid=(B,), in_specs=in_specs, out_specs=in_specs,
            out_shape=out_shapes,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(**params),
        )

        def run(ops):
            return call(*ops)

        run = jax.jit(run)
        # Donation semantics: pass operands as ARGUMENTS (the production
        # while_loop feeds outputs back as inputs, so per-call defensive
        # copies do not occur there; to mimic, consume the previous
        # output as the next input).
        ops = list(operands)
        out = run(ops)
        jax.device_get(jax.tree.leaves(out)[0][:1, :1])
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = run([out[i] for i in range(len(ops))])
        jax.device_get(jax.tree.leaves(out)[0][:1, :1])
        dt = (time.perf_counter() - t0) / reps
        log(f"{name:28s} {dt * 1e3:8.2f} ms total, "
            f"{dt / B * 1e6:8.1f} us per lane-step")

    sds = jax.ShapeDtypeStruct
    make("tile alias", [Tt], tile_kernel, [tile],
         [sds((B * M, R1), jnp.float32)], {0: 0})
    make("tile fresh", [Tt], tile_kernel, [tile],
         [sds((B * M, R1), jnp.float32)], {})
    ops9 = [Tt, rows[0], rows[1], cols[0], cols[1], lane, rows[2],
            smems[0], smems[1]]
    specs9 = [tile, rowv, rowv, colv, colv, lanev, rowv, smem8, smem8]
    shapes9 = [sds((B * M, R1), jnp.float32),
               sds((B, 1, R1), jnp.float32),
               sds((B, 1, R1), jnp.float32),
               sds((B * M, 1), jnp.float32),
               sds((B * M, 1), jnp.float32),
               sds((B, 1, M), jnp.int32),
               sds((B, 1, R1), jnp.float32),
               sds((B, 1, 8), jnp.float32),
               sds((B, 1, 8), jnp.int32)]
    make("all9 alias", ops9, all9_kernel, specs9, shapes9,
         {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6})
    make("all9 fresh", ops9, all9_kernel, specs9, shapes9, {})
    make("tile alias parallel", [Tt], tile_kernel, [tile],
         [sds((B * M, R1), jnp.float32)], {0: 0},
         semantics=("parallel",))
    make("all9 alias parallel", ops9, all9_kernel, specs9, shapes9,
         {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6},
         semantics=("parallel",))
    make("tile alias arbitrary", [Tt], tile_kernel, [tile],
         [sds((B * M, R1), jnp.float32)], {0: 0},
         semantics=("arbitrary",))

    # Discriminator: same copy with the lane tile SPLIT into 4 blocks
    # along r_pad, grid (B, 4) — 1.6 MB blocks instead of 6.3 MB. If
    # the per-step cost is a fixed dispatch overhead, 4x the steps gets
    # WORSE; if over-large buffers were defeating double-buffering,
    # smaller blocks overlap and the total DROPS toward the DMA floor.
    for k in (2, 4, 8):
        tile_k = pl.BlockSpec((M, R1 // k), lambda b, j: (b, j),
                              memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            tile_kernel, grid=(B, k), in_specs=[tile_k],
            out_specs=[tile_k],
            out_shape=[sds((B * M, R1), jnp.float32)],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        run = jax.jit(lambda x, call=call: call(x))
        out = run(Tt)
        jax.device_get(out[0][:1, :1])
        t0 = time.perf_counter()
        for _ in range(10):
            out = run(out[0])
        jax.device_get(out[0][:1, :1])
        dt = (time.perf_counter() - t0) / 10
        log(f"{'tile alias split%d' % k:28s} {dt * 1e3:8.2f} ms total, "
            f"{dt / B * 1e6:8.1f} us per lane-step")
    print("PROFILE_ALIAS_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
