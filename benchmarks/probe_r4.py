"""Round-4 Pallas micro-probes on real TPU:

1. floor (read tile + sum) for int32 vs int8 vs uint16 tiles — is the
   2.3 ms floor input-byte-bound (int8 would quarter it) or
   block-overhead-bound?
2. lane dynamic-gather cost for uint32 vs uint16 operands — does a
   16-bit probe halve the per-gather cost (the premise of the
   16-bit-partial-equality search idea)?
3. window math reading int8 tiles (the TL sublane slices on packed
   8-bit rows) vs the int32 baseline.

Chained-dispatch methodology from probe_kernel_cost.py: K dispatches,
ONE readback, fresh inputs per rep.
"""
import functools
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

from metakssd_tpu.ops import sketch_pallas  # noqa: E402

RWIN = sketch_pallas.RWIN
LANES = 128
EXT = 32                      # 32-row overlap: i8-tile (32,128) aligned
K = 16
NWIN = 1 << 24
BW = RWIN * LANES
NBLOCKS = NWIN // BW
TLk = 22                      # k=11

rng = np.random.default_rng(0)
base_i32 = rng.integers(0, 4, size=(NBLOCKS, RWIN + EXT, LANES),
                        dtype=np.int32)
t_i32 = jax.block_until_ready(jax.device_put(base_i32))
t_i8 = jax.block_until_ready(jax.device_put(base_i32.astype(np.int8)))
t_u16 = jax.block_until_ready(jax.device_put(base_i32.astype(np.uint16)))

tab32 = jax.device_put(
    np.sort(rng.integers(0, 1 << 24, (32, LANES), dtype=np.uint32)))
tab16 = jax.device_put(
    np.sort(rng.integers(0, 1 << 16, (32, LANES)).astype(np.uint16)))


def timeit(name, fn, vary):
    fn = (lambda g: jax.jit(lambda t: jnp.sum(
        jax.tree_util.tree_leaves(g(t))[0].astype(jnp.int32))))(fn)
    np.asarray(fn(vary[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(v) for v in vary]
        np.asarray(jnp.stack(outs).sum())
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best * 1000 / K:7.2f} ms/dispatch "
          f"({NWIN * K / best / 1e6:5.0f} Mwin/s)", flush=True)


def block_spec(dtype):
    return pl.BlockSpec((1, RWIN + EXT, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def make_floor(dtype):
    def kern(c_ref, out_ref):
        out_ref[0] = jnp.sum(c_ref[0].astype(jnp.int32), axis=0,
                             keepdims=True)

    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(NBLOCKS,),
            in_specs=[block_spec(dtype)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES),
                                           jnp.int32))(t)
    return fn


def make_gather(ng, tab, out_dtype):
    """ng chained lane-gathers from a 32-row VMEM table."""
    def kern(c_ref, tab_ref, out_ref):
        pos = (c_ref[0][:RWIN] & 3).astype(jnp.int32) * 683 & 4095
        rows = [tab_ref[v, :] for v in range(32)]
        # Mosaic requires gather indices and result to share a bitwidth
        idx_dtype = jnp.int16 if rows[0].dtype.itemsize == 2 else jnp.int32
        acc = jnp.zeros((RWIN, LANES), jnp.int32)
        for g in range(ng):
            col = (pos & 127).astype(idx_dtype)
            row = (pos >> 7) & 31
            res = jnp.zeros(pos.shape, dtype=rows[0].dtype)
            for v, rv in enumerate(rows):
                bc = jnp.broadcast_to(rv[None, :], pos.shape)
                gat = jnp.take_along_axis(bc, col, axis=1)
                res = jnp.where(row == v, gat, res)
            acc = acc + res.astype(jnp.int32)
            pos = (pos + res.astype(jnp.int32)) & 4095
        out_ref[0] = jnp.sum(acc, axis=0, keepdims=True)

    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(NBLOCKS,),
            in_specs=[block_spec(jnp.int32),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES),
                                           jnp.int32))(t, tab)
    return fn


def make_gather_1row(ng, tab, dtype):
    """ng chained single-row gathers (the sz<=128 BFS level shape)."""
    def kern(c_ref, tab_ref, out_ref):
        pos = (c_ref[0][:RWIN] & 3).astype(jnp.int32) * 37 & 127
        acc = jnp.zeros((RWIN, LANES), jnp.int32)
        row0 = tab_ref[0, :]
        for g in range(ng):
            bc = jnp.broadcast_to(row0[None, :], pos.shape)
            gat = jnp.take_along_axis(bc, pos, axis=1)
            acc = acc + gat.astype(jnp.int32)
            pos = (pos + gat.astype(jnp.int32)) & 127
        out_ref[0] = jnp.sum(acc, axis=0, keepdims=True)

    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(NBLOCKS,),
            in_specs=[block_spec(jnp.int32),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES),
                                           jnp.int32))(t, tab)
    return fn


def make_winmath(dtype):
    def kern(c_ref, out_ref):
        c = c_ref[0]
        fwd_hi = jnp.zeros((RWIN, LANES), jnp.uint32)
        fwd_lo = jnp.zeros((RWIN, LANES), jnp.uint32)
        rc_hi = jnp.zeros((RWIN, LANES), jnp.uint32)
        rc_lo = jnp.zeros((RWIN, LANES), jnp.uint32)
        invalid = jnp.zeros((RWIN, LANES), jnp.bool_)
        for j in range(TLk):
            cs = c[j:j + RWIN, :]
            seg = (cs & np.int8(3) if dtype == jnp.int8
                   else cs & 3).astype(jnp.uint32)
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
        acc = (uni_hi ^ uni_lo) | invalid.astype(jnp.uint32)
        out_ref[0] = jnp.sum(acc.astype(jnp.int32), axis=0,
                             keepdims=True)

    @jax.jit
    def fn(t):
        return pl.pallas_call(
            kern, grid=(NBLOCKS,),
            in_specs=[block_spec(dtype)],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES),
                                           jnp.int32))(t)
    return fn


def vary_of(t):
    return [jax.block_until_ready(t ^ np.asarray(i).astype(t.dtype))
            for i in range(K)]


if __name__ == "__main__":
    v32, v8, v16 = vary_of(t_i32), vary_of(t_i8), vary_of(t_u16)
    print(f"RWIN={RWIN} EXT={EXT} nblocks={NBLOCKS} K={K}", flush=True)
    timeit("floor i32", make_floor(jnp.int32), v32)
    timeit("floor i8", make_floor(jnp.int8), v8)
    timeit("floor u16", make_floor(jnp.uint16), v16)
    timeit("winmath i32", make_winmath(jnp.int32), v32)
    # winmath i8: v5e Mosaic rejects i8 vector compares ("Target does
    # not support this comparison") — int8 tiles are a dead end on
    # this generation (and the floor probes show the floor is not
    # input-byte-bound anyway)
    timeit("30x 32-row gather u32", make_gather(30, tab32, jnp.uint32),
           v32)
    timeit("30x 32-row gather u16", make_gather(30, tab16, jnp.uint16),
           v32)
    timeit("30x 1-row gather u32", make_gather_1row(30, tab32,
                                                    jnp.uint32), v32)
