"""Pallas merge-path membership kernel (device side of ops/merge.py;
split so the host fallback path never imports jax)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metakssd_tpu.ops.merge import BLOCK, LANES, UINT32_MAX, W

def _lookup_rows(tab, pos):
    """tab [R,128] (VMEM value), pos int32 [r,128] in [0, R*128):
    per-element lookup via lane dynamic-gather + row select."""
    col = pos & 127
    row = pos >> 7
    res = jnp.zeros(pos.shape, dtype=tab.dtype)
    for v in range(tab.shape[0]):
        bc = jnp.broadcast_to(tab[v][None, :], pos.shape)
        g = jnp.take_along_axis(bc, col, axis=1)
        res = jnp.where(row == v, g, res)
    return res


def _member_kernel(mblk_ref, hay0_ref, hay1_ref, val0_ref, val1_ref,
                   needles_ref, member_ref, value_ref):
    hay = jnp.concatenate([hay0_ref[:], hay1_ref[:]], axis=0)  # [32,128]
    vals = jnp.concatenate([val0_ref[:], val1_ref[:]], axis=0)
    needles = needles_ref[:]                 # [BLOCK//LANES, LANES]

    n_win = 2 * W
    pos = jnp.zeros(needles.shape, jnp.int32)
    step = n_win // 2
    while step >= 1:
        mid = pos + step - 1
        v = _lookup_rows(hay, mid)
        pos = jnp.where(v < needles, pos + step, pos)
        step //= 2
    clamped = jnp.minimum(pos, n_win - 1)
    hit = (_lookup_rows(hay, clamped) == needles) & \
        (needles != UINT32_MAX)
    val = jnp.where(hit, _lookup_rows(vals, clamped), np.uint32(0))
    member_ref[:] = hit.astype(jnp.int32)
    value_ref[:] = val


@functools.partial(jax.jit, static_argnames=("nblocks", "interpret"))
def _member_pallas(mblk, hay2d, val2d, needles2d, *, nblocks,
                   interpret=False):
    WR = W // LANES
    BR = BLOCK // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((WR, LANES), lambda b, mblk: (mblk[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WR, LANES), lambda b, mblk: (mblk[b] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WR, LANES), lambda b, mblk: (mblk[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WR, LANES), lambda b, mblk: (mblk[b] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, LANES), lambda b, mblk: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BR, LANES), lambda b, mblk: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, LANES), lambda b, mblk: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _member_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * BR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nblocks * BR, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(mblk, hay2d, hay2d, val2d, val2d, needles2d)


