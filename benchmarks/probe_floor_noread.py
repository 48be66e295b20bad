"""Split the compact-kernel floor (~2 ms / 16.7M windows): is it the
input DMA/grid machinery or the reduction over the tile?

Variants, same block spec ([RWIN+EXT, 128] int32 in VMEM, grid=nblocks):
  noread   — ignore the input entirely, write a constant
  touch8   — read only the first 8 rows (one vreg), sum them
  sumall   — the original floor (sum every row)
  xorfold  — touch every row with a log-depth XOR fold (tree, not a
             sequential row reduction)
Chained-dispatch methodology (K dispatches, one readback).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128
RWIN = 512
EXT = 32
K = 16
NWIN = 1 << 24
NBLOCKS = NWIN // (RWIN * LANES)

rng = np.random.default_rng(0)
base = rng.integers(0, 4, size=(NBLOCKS, RWIN + EXT, LANES),
                    dtype=np.int32)
vary = [jax.block_until_ready(jax.device_put(base ^ i))
        for i in range(K)]


def mk(kern):
    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(NBLOCKS,),
            in_specs=[pl.BlockSpec((1, RWIN + EXT, LANES),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES),
                                           jnp.int32))(t)
    return fn


def k_noread(c_ref, out_ref):
    out_ref[0] = jnp.full((1, LANES), pl.program_id(0), jnp.int32)


def k_touch8(c_ref, out_ref):
    out_ref[0] = jnp.sum(c_ref[0][:8], axis=0, keepdims=True)


def k_sumall(c_ref, out_ref):
    out_ref[0] = jnp.sum(c_ref[0][:RWIN], axis=0, keepdims=True)


def k_xorfold(c_ref, out_ref):
    x = c_ref[0][:RWIN]
    h = RWIN // 2
    while h >= 1:
        x = x[:h] ^ x[h:2 * h]
        h //= 2
    out_ref[0] = x


def timeit(name, fn):
    fn = (lambda g: jax.jit(lambda t: jnp.sum(g(t))))(fn)
    np.asarray(fn(vary[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(v) for v in vary]
        np.asarray(jnp.stack(outs).sum())
        best = min(best, time.time() - t0)
    print(f"{name:10s} {best * 1000 / K:7.2f} ms/dispatch "
          f"({NWIN * K / best / 1e6:5.0f} Mwin/s)", flush=True)


if __name__ == "__main__":
    timeit("noread", mk(k_noread))
    timeit("touch8", mk(k_touch8))
    timeit("sumall", mk(k_sumall))
    timeit("xorfold", mk(k_xorfold))
