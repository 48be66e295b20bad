"""Is the compact-kernel floor (read tiles + sum, ~1.9 ms / 7.4 us per
512x128 block at RWIN=512) grid-overhead-bound?  Compare the floor and
a winmath-like pass at block sizes 512/1024/2048 rows, processing the
larger blocks in sequential 512-row chunks inside the kernel (bounds
temporary VMEM at the RWIN=512 working set while amortizing per-block
overhead).  Chained-dispatch methodology (K dispatches, one readback).
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
EXT = 32
K = 16
NWIN = 1 << 24
CH = 512                       # chunk rows (the RWIN=512 working set)
TLk = 22

rng = np.random.default_rng(0)


def make_floor(rows):
    """Block of `rows` window rows, summed in CH-row chunks."""
    nblocks = NWIN // (rows * LANES)

    def kern(c_ref, out_ref):
        acc = jnp.zeros((1, LANES), jnp.int32)
        for s in range(0, rows, CH):
            acc = acc + jnp.sum(c_ref[0][s:s + CH].astype(jnp.int32),
                                axis=0, keepdims=True)
        out_ref[0] = acc

    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(nblocks,),
            in_specs=[pl.BlockSpec((1, rows + EXT, LANES),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks, 1, LANES),
                                           jnp.int32))(t)
    return fn, nblocks


def make_winmath(rows):
    """Window math (the TL-shift loop) in CH-row chunks per block."""
    nblocks = NWIN // (rows * LANES)

    def kern(c_ref, out_ref):
        c = c_ref[0]
        acc = jnp.zeros((1, LANES), jnp.int32)
        for s in range(0, rows, CH):
            fwd_hi = jnp.zeros((CH, LANES), jnp.uint32)
            fwd_lo = jnp.zeros((CH, LANES), jnp.uint32)
            rc_hi = jnp.zeros((CH, LANES), jnp.uint32)
            rc_lo = jnp.zeros((CH, LANES), jnp.uint32)
            invalid = jnp.zeros((CH, LANES), jnp.bool_)
            for j in range(TLk):
                cs = c[s + j:s + j + CH, :]
                seg = (cs & 3).astype(jnp.uint32)
                invalid = invalid | (cs >= 4)
                fpos = 2 * (TLk - 1 - j)
                if fpos >= 32:
                    fwd_hi = fwd_hi | (seg << np.uint32(fpos - 32))
                else:
                    fwd_lo = fwd_lo | (seg << np.uint32(fpos))
                rseg = seg ^ np.uint32(3)
                rpos = 2 * j
                if rpos >= 32:
                    rc_hi = rc_hi | (rseg << np.uint32(rpos - 32))
                else:
                    rc_lo = rc_lo | (rseg << np.uint32(rpos))
            take_fwd = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) &
                                           (fwd_lo <= rc_lo))
            uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
            uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)
            v = (uni_hi ^ uni_lo) | invalid.astype(jnp.uint32)
            acc = acc + jnp.sum(v.astype(jnp.int32), axis=0,
                                keepdims=True)
        out_ref[0] = acc

    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(nblocks,),
            in_specs=[pl.BlockSpec((1, rows + EXT, LANES),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks, 1, LANES),
                                           jnp.int32))(t)
    return fn, nblocks


def timeit(name, fn, vary):
    fn = (lambda g: jax.jit(lambda t: jnp.sum(g(t))))(fn)
    np.asarray(fn(vary[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(v) for v in vary]
        np.asarray(jnp.stack(outs).sum())
        best = min(best, time.time() - t0)
    print(f"{name:30s} {best * 1000 / K:7.2f} ms/dispatch "
          f"({NWIN * K / best / 1e6:5.0f} Mwin/s)", flush=True)


if __name__ == "__main__":
    for rows in (512, 1024, 2048):
        nblocks = NWIN // (rows * LANES)
        base = rng.integers(0, 4, size=(nblocks, rows + EXT, LANES),
                            dtype=np.int32)
        vary = [jax.block_until_ready(jax.device_put(base ^ i))
                for i in range(K)]
        fl, nb = make_floor(rows)
        timeit(f"floor rows={rows} nb={nb}", fl, vary)
        wm, nb = make_winmath(rows)
        timeit(f"winmath rows={rows} nb={nb}", wm, vary)
        del vary
