"""Decompose the compact-kernel cost on real TPU: floor (read+sum),
window math only, +BFS search, vs the full compact kernel.  Identifies
which stage to optimize (round-3 note: a bare floor kernel once measured
*slower* than the full kernel through the degraded tunnel — remeasure on
a healthy chip before drawing conclusions)."""
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

from metakssd_tpu.params import SketchParams  # noqa: E402
from metakssd_tpu.formats.shuf import make_shuf  # noqa: E402
from metakssd_tpu.ops import sketch_xla, sketch_pallas  # noqa: E402

RWIN = sketch_pallas.RWIN
LANES = sketch_pallas.LANES

shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=1234)
p = shuf.params
a_tups, a_pf, _ = shuf.device_tables()
rng = np.random.default_rng(0)

BW = RWIN * LANES
NWIN = 1 << 24
NBLOCKS = NWIN // BW
TL = p.kmer_len
K = 16

codes = rng.integers(0, 4, size=NWIN + TL - 1).astype(np.uint8)
packed, vmask = sketch_xla.pack_codes(
    np.concatenate([codes, np.full(RWIN + sketch_pallas._ext(TL), 255,
                                   np.uint8)]))
need = NWIN + RWIN + sketch_pallas._ext(TL)
tiles = sketch_pallas._restructure_packed(jax.device_put(packed),
                                          jax.device_put(vmask),
                                          nblocks=NBLOCKS, TL=TL, n=need)
tiles = jax.block_until_ready(tiles)
a2d = jax.device_put(np.asarray(a_tups).reshape(-1, 128))
p2d = jax.device_put(np.asarray(a_pf).reshape(-1, 128))
lev2d = jax.device_put(sketch_pallas._bfs_levels(np.asarray(a_tups)))
sig2d = jax.device_put(sketch_pallas._sig_tables(np.asarray(a_tups)))
vary = [jax.block_until_ready(tiles ^ i) for i in range(K)]


def timeit(name, fn):
    fn = (lambda g: jax.jit(lambda t: jnp.sum(
        jax.tree_util.tree_leaves(g(t))[0].astype(jnp.int32))))(fn)
    o = fn(vary[0])
    np.asarray(o)                                    # warm compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(vary[i]) for i in range(K)]
        np.asarray(jnp.stack(outs).sum())            # ONE readback
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best * 1000 / K:7.1f} ms/dispatch "
          f"({NWIN * K / best / 1e6:5.0f} Mwin/s)", flush=True)


# --- floor: read tile, write a [1,128] sum ------------------------------
def _floor_kernel(c_ref, out_ref):
    out_ref[0] = jnp.sum(c_ref[0], axis=0, keepdims=True)


@jax.jit
def floor_fn(t):
    ext = sketch_pallas._ext(TL)
    return pl.pallas_call(
        _floor_kernel,
        grid=(NBLOCKS,),
        in_specs=[pl.BlockSpec((1, RWIN + ext, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES), jnp.int32),
    )(t)


# --- window math only (no search, no epilogue) ---------------------------
def _winmath_kernel(c_ref, out_ref, *, k, subk):
    TLk = 2 * k
    c = c_ref[0]
    code = (c & 3).astype(jnp.uint32)
    fwd_hi = jnp.zeros((RWIN, LANES), jnp.uint32)
    fwd_lo = jnp.zeros((RWIN, LANES), jnp.uint32)
    rc_hi = jnp.zeros((RWIN, LANES), jnp.uint32)
    rc_lo = jnp.zeros((RWIN, LANES), jnp.uint32)
    invalid = jnp.zeros((RWIN, LANES), jnp.bool_)
    for j in range(TLk):
        seg = code[j:j + RWIN, :]
        invalid = invalid | (c[j:j + RWIN, :] >= 4)
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
    take_fwd = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo <= rc_lo))
    uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)
    acc = (uni_hi ^ uni_lo) | invalid.astype(jnp.uint32)
    out_ref[0] = jnp.sum(acc.astype(jnp.int32), axis=0, keepdims=True)


@jax.jit
def winmath_fn(t):
    ext = sketch_pallas._ext(TL)
    kern = functools.partial(_winmath_kernel, k=p.k, subk=p.subk)
    return pl.pallas_call(
        kern,
        grid=(NBLOCKS,),
        in_specs=[pl.BlockSpec((1, RWIN + ext, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES), jnp.int32),
    )(t)


# --- window math + BFS search (no compaction epilogue) -------------------
def _search_kernel(c_ref, accept_ref, pfil_ref, lev_ref, sig_ref,
                   out_ref, *, k, subk, drlevel, n_accept, use_sig):
    base, pos, keep, _ = sketch_pallas._window_compute(
        c_ref, accept_ref, pfil_ref, lev_ref,
        sig_ref if use_sig else None,
        k=k, subk=subk, drlevel=drlevel, n_accept=n_accept)
    acc = jnp.where(keep, base | pos.astype(jnp.uint32), jnp.uint32(0))
    out_ref[0] = jnp.sum(acc.astype(jnp.int32), axis=0, keepdims=True)


def make_search_fn(use_sig):
    @jax.jit
    def search_fn(t):
        ext = sketch_pallas._ext(TL)
        kern = functools.partial(_search_kernel, k=p.k, subk=p.subk,
                                 drlevel=p.drlevel, n_accept=a_tups.size,
                                 use_sig=use_sig)
        return pl.pallas_call(
            kern,
            grid=(NBLOCKS,),
            in_specs=[
                pl.BlockSpec((1, RWIN + ext, LANES), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLOCKS, 1, LANES),
                                           jnp.int32),
        )(t, a2d, p2d, lev2d, sig2d)
    return search_fn


# --- full compact kernel --------------------------------------------------
kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nblocks=NBLOCKS,
          n_accept=a_tups.size, use_bfs=True, pack=True)
full_fn = lambda t: sketch_pallas.sketch_tiles_compact_pallas(  # noqa: E731
    t, a2d, p2d, lev2d, **kw)
full_sig_fn = lambda t: sketch_pallas.sketch_tiles_compact_pallas(  # noqa: E731
    t, a2d, p2d, lev2d, sig2d, use_sig=True, **kw)

print(f"RWIN={RWIN} CSLOT={sketch_pallas.CSLOT} nblocks={NBLOCKS}",
      flush=True)
timeit("floor (read+sum)", floor_fn)
timeit("window math only", winmath_fn)
timeit("winmath + BFS search", make_search_fn(False))
timeit("winmath + sig-probe search", make_search_fn(True))
timeit("full compact kernel (BFS)", full_fn)
timeit("full compact kernel (sig)", full_sig_fn)
