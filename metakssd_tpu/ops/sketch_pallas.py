"""Fused Pallas TPU kernel for KSSD window decomposition.

Why: the XLA path's per-window accept-bitmask lookup lowers to a scalar
HBM gather (~100M lookups/s, the dominant cost).  Here the whole filter
runs in VMEM: the sorted accept table (dim_end entries, 16 KiB at the
default 4096) lives on-chip and every lookup is a branchless binary
search whose per-step table read is a *lane* dynamic-gather (a native
VPU shuffle), giving >1G windows/s of filter throughput.

Layout: windows are laid out column-major in [R, 128] tiles — lane l of
a block owns the R consecutive windows [l*R, (l+1)*R) — so the sliding
k-mer window build becomes cheap sublane shifts (static slices), never a
cross-lane shuffle.  The host-side restructure is two reshapes and a
transpose in XLA (bandwidth-bound, no gathers).

The kernel emits per-window (drtuple, keep); compaction stays in XLA as
a sort (survivors ~1/4096).

Parity surface: the hot loop this replaces is the reference's per-base
rolling tuple + dim-shuffle hash probe (iseq2comem.c:287-294 and the
surrounding window scan 240-311); outputs are bit-exact vs ops/golden.py
and byte-identical through the CLI vs the reference binary.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# windows per lane per block (block = 128*RWIN windows); env-tunable for
# hardware sweeps (power of two >= 8).  Round-4 v5e sweep with the
# sig-probe search at CSLOT=4: RWIN 256 -> 4157 Mwin/s vs 512 -> 3713
# (smaller per-lane survivor budget pressure, same floor).
RWIN = int(os.environ.get("MKSSD_PALLAS_RWIN", 256))
LANES = 128

# BFS levels up to this many splitters resolve via a scalar select tree
# instead of a lane dynamic-gather.  v5e sweep (round 3, full-BFS
# path): 0 (disabled) 3159 Mwin/s vs 32 -> 3026 / 64 -> 2998.  Round-5
# sweep on the sig-probe descent (shallow levels only): 0 -> 4151,
# 1 -> 4003, 2 -> 4093, 8 -> 4165 (noise-level; 4 blew the Mosaic
# compile budget) — the gather wins or ties everywhere on v5e, so the
# tree stays off by default (env-tunable for other TPU gens).
_SELTREE_MAX = int(os.environ.get("MKSSD_PALLAS_SELTREE", 0))

# Round-4 signature-probe search (compact path): stop the exact BFS at
# the 128-bucket level (7 single-row gathers), test membership of the
# bucket's n_accept/128-entry run with pair-packed low-16-bit signatures
# (R/2 single-row gathers + cheap compares; false-positive rate
# ~R/2^16, zero false negatives), and resolve the exact position/hit on
# the tiny compacted [CSLOT, 128] tile.  Cuts the deep search levels
# (2+4+8+16 = 30 row-ops at n_accept=4096, ~74 us each on a [512,128]
# tile, v5e) to 16 row-ops.  Env-tunable off for A/B sweeps.
_SIG_ENABLE = os.environ.get("MKSSD_PALLAS_SIG", "1") != "0"


def _ext(TL: int) -> int:
    """Overlap rows, rounded up for sublane alignment."""
    return -(-(TL - 1) // 8) * 8


def _lookup(tab_rows: list, pos):
    """table[pos] for a sorted table held as a list of [128] rows in
    registers/VMEM; pos int32 in [0, 128*len(rows)).  One lane-gather +
    select per row.  (Selecting the row first and gathering once is NOT
    equivalent: the gather moves each element to lane col[i,j], whose
    row choice belongs to a different element.)"""
    col = pos & 127
    row = pos >> 7
    res = jnp.zeros(pos.shape, dtype=tab_rows[0].dtype)
    for v, rowvals in enumerate(tab_rows):
        bc = jnp.broadcast_to(rowvals[None, :], pos.shape)
        g = jnp.take_along_axis(bc, col, axis=1)
        res = jnp.where(row == v, g, res)
    return res


def _bfs_levels(accept_tups: np.ndarray) -> np.ndarray:
    """Splitter values of the binary search, one contiguous row-group per
    level (BFS layout): level d holds the 2^d values the search can
    compare at step d, indexed by the path bits so far.  The kernel then
    touches 1 row for levels up to 128 wide instead of select-chaining
    across all n/128 rows of the full table every step."""
    n = accept_tups.size
    L = n.bit_length() - 1
    rows = []
    for d in range(L):
        sz = 1 << d
        step = n >> (d + 1)
        vals = accept_tups[(2 * np.arange(sz) + 1) * step - 1]
        row = np.zeros(max(LANES, sz), np.uint32)
        row[:sz] = vals
        rows.append(row.reshape(-1, LANES))
    return np.concatenate(rows, axis=0)


def kernel_modes(p, n_accept: int) -> tuple[bool, bool, bool]:
    """(use_bfs, pack, use_sig) for a SketchParams + accept-table size —
    the single home of the kernel-mode decision (product path and
    benchmarks must agree)."""
    use_bfs = (n_accept & (n_accept - 1)) == 0
    pack = use_bfs and (n_accept.bit_length() - 1) <= 4 * (p.subk -
                                                           p.drlevel)
    # signature-probe search: pos7 rides the drtuple's zero low bits
    # (pack) or the dim channel's spare high bits (4*subk + 7 <= 32 —
    # covers the heavy-downsampling no-pack configs, e.g. 16S-style
    # subk-drlevel < 3); needs the BFS level layout and >= 2 runs/bucket
    use_sig = (_SIG_ENABLE and use_bfs and n_accept > LANES
               and (pack or 4 * p.subk + 7 <= 32))
    return use_bfs, pack, use_sig


def _sig_tables(accept_tups: np.ndarray) -> np.ndarray:
    """[R/2, 128] uint32 for the signature-probe search: row w holds the
    pair-packed low-16-bit signatures of bucket b's run (lane b, word
    w = sig(entry 2w) | sig(entry 2w+1) << 16).  R = n_accept/128
    (power of two >= 2)."""
    n = accept_tups.size
    R = n // LANES
    runs = accept_tups.reshape(LANES, R)            # [bucket, rank]
    s16 = (runs & np.uint32(0xFFFF)).astype(np.uint32)
    return (s16[:, 0::2] | (s16[:, 1::2] << np.uint32(16))).T


def _window_compute(c_ref, accept_ref, pfil_ref, lev_ref, sig_ref=None, *,
                    k: int, subk: int, drlevel: int, n_accept: int):
    """Shared window math: -> (base uint32, pos int32, keep bool,
    dim uint32), each [RWIN, 128].  ``pos`` is the accept-table index of
    the window's inner substring (valid where keep); drtuple =
    base + pfilters[pos].

    With ``sig_ref`` (signature-probe mode, compact path only): the BFS
    stops at the 128-bucket level, ``pos`` is the *bucket* index
    pos7 in [0, 128), and ``keep`` is a conservative superset of the
    true hits (false positives ~R/2^16 where R = n_accept/128; zero
    false negatives — a true member's low-16 signature is by definition
    among its own run's signatures).  The caller must verify exactly on
    the compacted tile (see _compact_kernel)."""
    TL = 2 * k
    outctx = k - subk

    c = c_ref[0]                       # [RWIN+ext, 128] int32; 4 = invalid
    code = (c & 3).astype(jnp.uint32)

    fwd_hi = jnp.zeros((RWIN, LANES), jnp.uint32)
    fwd_lo = jnp.zeros((RWIN, LANES), jnp.uint32)
    rc_hi = jnp.zeros((RWIN, LANES), jnp.uint32)
    rc_lo = jnp.zeros((RWIN, LANES), jnp.uint32)
    invalid = jnp.zeros((RWIN, LANES), jnp.bool_)
    for j in range(TL):
        seg = code[j:j + RWIN, :]
        invalid = invalid | (c[j:j + RWIN, :] >= 4)
        fpos = 2 * (TL - 1 - j)
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

    # inner substring
    s = 2 * outctx
    bits = 4 * subk
    if s == 0:
        dim = uni_lo
    elif s < 32:
        dim = (uni_lo >> np.uint32(s)) | (uni_hi << np.uint32(32 - s))
    else:
        dim = uni_hi >> np.uint32(s - 32)
    if bits < 32:
        dim = dim & np.uint32((1 << bits) - 1)

    # branchless binary search over the sorted accept table
    if sig_ref is not None:
        # signature-probe mode: exact descent only to the 128-bucket
        # level (single-row gathers), then a pair-packed low-16-bit
        # signature test of the bucket's R-entry run
        R = n_accept // LANES
        pos = jnp.zeros((RWIN, LANES), jnp.int32)
        for d in range(7):
            sz = 1 << d
            if sz <= _SELTREE_MAX:
                # shallow levels: sz-1 scalar selects instead of a lane
                # dynamic-gather (the r3 "seltree loses" sweep covered
                # the deep BFS levels only; for sz<=4 this trades 3
                # gathers for 4 selects — sweep MKSSD_PALLAS_SELTREE)
                cur = [lev_ref[d, q] for q in range(sz)]
                bit = 0
                while len(cur) > 1:
                    b = ((pos >> bit) & 1) == 1
                    cur = [jnp.where(b, cur[q + 1], cur[q])
                           for q in range(0, len(cur), 2)]
                    bit += 1
                val = jnp.broadcast_to(cur[0], pos.shape)
            else:
                bc = jnp.broadcast_to(lev_ref[d, :][None, :], pos.shape)
                val = jnp.take_along_axis(bc, pos, axis=1)
            pos = 2 * pos + (val < dim).astype(jnp.int32)
        dimsig = dim & jnp.uint32(0xFFFF)
        hit = jnp.zeros((RWIN, LANES), jnp.bool_)
        for w in range(R // 2):
            bc = jnp.broadcast_to(sig_ref[w, :][None, :], pos.shape)
            word = jnp.take_along_axis(bc, pos, axis=1)
            hit = hit | ((word & jnp.uint32(0xFFFF)) == dimsig) \
                | ((word >> jnp.uint32(16)) == dimsig)
    elif lev_ref is not None:
        # BFS splitter layout: step d reads its 2^d-value level (1 row
        # for d <= 7) instead of gathering across the full table.  The
        # last compared value on a left turn (val >= dim) is exactly
        # accept[pos] (verified exhaustively host-side), so the final
        # hit check costs one compare instead of a full-table lookup;
        # the all-right path (pos == n-1, never compared) reads the
        # table's last element at a static index.
        L = n_accept.bit_length() - 1
        pos = jnp.zeros((RWIN, LANES), jnp.int32)
        lv = jnp.full((RWIN, LANES), 0xFFFFFFFF, jnp.uint32)
        off = 0
        for d in range(L):
            sz = 1 << d
            nrow = max(1, sz // LANES)
            if sz <= _SELTREE_MAX:
                # few splitters: a select tree over scalar reads beats a
                # lane dynamic-gather (~1 us/select vs ~67 us/gather on
                # [512,128] v5e tiles)
                cur = [lev_ref[off, q] for q in range(sz)]
                bit = 0
                while len(cur) > 1:
                    b = ((pos >> bit) & 1) == 1
                    cur = [jnp.where(b, cur[q + 1], cur[q])
                           for q in range(0, len(cur), 2)]
                    bit += 1
                val = jnp.broadcast_to(cur[0], pos.shape)
            elif sz <= LANES:
                bc = jnp.broadcast_to(lev_ref[off, :][None, :], pos.shape)
                val = jnp.take_along_axis(bc, pos, axis=1)
            else:
                val = _lookup([lev_ref[off + r, :] for r in range(nrow)],
                              pos)
            right = val < dim
            pos = 2 * pos + right.astype(jnp.int32)
            lv = jnp.where(right, lv, val)
            off += nrow
        last = accept_ref[n_accept // LANES - 1, LANES - 1]
        # pos == n-1 iff the all-right path, which is exactly when lv
        # kept its 0xFFFFFFFF sentinel — selecting on pos (not on the
        # sentinel value) keeps the check correct even if dim could ever
        # reach 2^32-1 (no reliance on the subk<8 invariant elsewhere).
        # Pure i1 logic, not jnp.where on bools: Mosaic lowers a
        # select-of-bool-vectors through an i8 mask and dies with
        # "Unsupported target bitwidth for truncation" (v5e, 2026-08).
        allr = pos == n_accept - 1
        hit = (allr & (last == dim)) | ((~allr) & (lv == dim))
    else:
        rows = [accept_ref[v, :] for v in range(n_accept // LANES)]
        pos = jnp.zeros((RWIN, LANES), jnp.int32)
        step = n_accept // 2
        while step >= 1:
            mid = pos + step - 1
            val = _lookup(rows, mid)
            pos = jnp.where(val < dim, pos + step, pos)
            step //= 2
        # pos <= n_accept - 1 by construction (path-bit accumulation)
        hit = _lookup(rows, pos) == dim

    # drtuple
    top_s = 4 * k - 2 * outctx
    if top_s == 0:
        top = uni_lo
    elif top_s < 32:
        top = (uni_lo >> np.uint32(top_s)) | (uni_hi << np.uint32(32 - top_s))
    else:
        top = uni_hi >> np.uint32(top_s - 32)
    if 2 * outctx < 32:
        top = top & np.uint32((1 << (2 * outctx)) - 1)
    right = uni_lo & np.uint32((1 << (2 * outctx)) - 1) if outctx else \
        jnp.zeros_like(uni_lo)
    base = ((top << np.uint32(2 * outctx)) | right) << \
        np.uint32(4 * (subk - drlevel))

    keep = (~invalid) & hit
    return base, pos, keep, dim


def _kernel(c_ref, accept_ref, pfil_ref, lev_ref, dr_ref, keep_ref, *,
            k: int, subk: int, drlevel: int, n_accept: int,
            use_bfs: bool):
    base, pos, keep, _ = _window_compute(
        c_ref, accept_ref, pfil_ref, lev_ref if use_bfs else None,
        k=k, subk=subk, drlevel=drlevel, n_accept=n_accept)
    prow = [pfil_ref[v, :] for v in range(n_accept // LANES)]
    dr = base + _lookup(prow, pos)
    dr_ref[0] = jnp.where(keep, dr, jnp.uint32(0xFFFFFFFF))
    keep_ref[0] = keep.astype(jnp.int32)


# Survivor slots per lane.  Round-4 v5e sweep with the sig-probe search
# + host verify: CSLOT 8 -> 4 = 3507 -> 3834 Mwin/s (each slot is two
# masked [RWIN,128] reductions now that dim is carried).  Expected
# coarse survivors/lane = RWIN*(1/4096 + sig-FP ~3e-4) ~= 0.14 at the
# RWIN=256 default, so P(lane > 4) ~ 5e-7 (at RWIN=512: 0.28 / ~1e-5)
# and overflowing blocks re-run per-block through
# the exact full-output kernel (cheap).  Round-3 note kept: RWIN 1024
# exceeds the 16 MiB scoped-VMEM limit; 256 ~= 512.
CSLOT = int(os.environ.get("MKSSD_PALLAS_CSLOT", 4))
MAXS = CSLOT * LANES  # compacted survivors per block (RWIN*128 windows)
SENT = 0xFFFFFFFF


def _compact_kernel(c_ref, accept_ref, pfil_ref, lev_ref, sig_ref,
                    out_ref, dim_ref, pos_ref, cnt_ref, *, k: int,
                    subk: int, drlevel: int, n_accept: int,
                    use_bfs: bool, pack: bool, use_sig: bool,
                    want_pos: bool):
    """Window kernel + in-VMEM compaction.

    Each lane owns RWIN consecutive windows; a log-shift prefix sum over
    the keep mask assigns every survivor a per-lane slot, and slot row j
    of the [CSLOT, 128] output is filled with one masked sublane
    reduction (exactly one survivor matches (slot==j, lane)).  Unused
    slots hold the SENT sentinel, which the caller filters.  Blocks
    where any lane overflows CSLOT slots — or where a real survivor
    collides with the sentinel value — report count MAXS+1 and are
    re-run exactly by the caller through the full-output kernel.

    With ``pack`` (accept-table index fits the drtuple's zero low bits),
    the per-window pfilter lookup is skipped entirely: survivors compact
    as base|pos and the pfilter is resolved on the tiny [CSLOT, 128]
    compacted tile — ~n_accept/128 select rows on 2K values instead of
    on every window.

    With ``use_sig``: the per-window search stops at the 128-bucket
    level and keeps a superset via the 16-bit signature probe (see
    _window_compute); survivors compact as PAIRS — (base|pos7, dim)
    when pack, (base, dim|pos7<<4subk) otherwise (pos7 rides the dim
    channel's spare high bits; caller guarantees 4*subk + 7 <= 32) —
    and the exact rank/hit/pfilter are resolved on the HOST over the
    ~0.03%-of-windows survivor prefix — cheaper than any in-kernel
    verify.  Reported counts are therefore *coarse* (false positives
    included); the caller drops them after the host verify.
    """
    pid = pl.program_id(0)
    base, pos, keep, dim = _window_compute(
        c_ref, accept_ref, pfil_ref, lev_ref if use_bfs else None,
        sig_ref if use_sig else None,
        k=k, subk=subk, drlevel=drlevel, n_accept=n_accept)
    prow = [pfil_ref[v, :] for v in range(n_accept // LANES)]
    if use_sig and not pack:
        v = base
        dim = dim | (pos.astype(jnp.uint32) << np.uint32(4 * subk))
    elif pack:
        v = base | pos.astype(jnp.uint32)
    else:
        v = base + _lookup(prow, pos)
    keepi = keep.astype(jnp.int32)
    total = jnp.sum(keepi)

    # per-lane inclusive prefix count (log-shift along sublanes)
    ps = keepi
    d = 1
    while d < RWIN:
        ps = ps + jnp.concatenate(
            [jnp.zeros((d, LANES), jnp.int32), ps[:RWIN - d]], axis=0)
        d *= 2
    slot = ps - 1                              # survivor's slot in its lane
    lane_tot = ps[RWIN - 1:RWIN, :]            # [1, 128]
    overflow = jnp.max(lane_tot) > CSLOT

    drv = jax.lax.bitcast_convert_type(v, jnp.int32)
    dimv = jax.lax.bitcast_convert_type(dim, jnp.int32)
    if want_pos:
        # window index within this dispatch: lane l of block pid owns
        # the RWIN consecutive windows [pid*RWIN*128 + l*RWIN, ..)
        win = (pid * (RWIN * LANES)
               + jax.lax.broadcasted_iota(jnp.int32, (RWIN, LANES), 1)
               * RWIN
               + jax.lax.broadcasted_iota(jnp.int32, (RWIN, LANES), 0))
    rows, drows, prows_ = [], [], []
    for j in range(CSLOT):
        sel = keep & (slot == j)
        rows.append(jnp.sum(jnp.where(sel, drv, 0), axis=0,
                            keepdims=True))
        if use_sig:
            drows.append(jnp.sum(jnp.where(sel, dimv, 0), axis=0,
                                 keepdims=True))
        if want_pos:
            prows_.append(jnp.sum(jnp.where(sel, win, 0), axis=0,
                                  keepdims=True))
    vals = jax.lax.bitcast_convert_type(
        jnp.concatenate(rows, axis=0), jnp.uint32)      # [CSLOT, 128]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (CSLOT, LANES), 0)
    valid = j_idx < jnp.broadcast_to(lane_tot, (CSLOT, LANES))
    if want_pos:
        posc = jnp.concatenate(prows_, axis=0).astype(jnp.uint32)
        pos_ref[0] = jnp.where(valid, posc, jnp.uint32(SENT))
    else:
        # unused channel: its out_shape shrinks to one row (see caller)
        pos_ref[0] = jnp.zeros((1, 1, LANES), jnp.uint32)[0]
    if use_sig:
        # emit (base|pos7, dim) pairs; exact verify happens on the host
        dimc = jax.lax.bitcast_convert_type(
            jnp.concatenate(drows, axis=0), jnp.uint32)
        dim_ref[0] = jnp.where(valid, dimc, jnp.uint32(SENT))
    else:
        dim_ref[0] = jnp.zeros((1, 1, LANES), jnp.uint32)[0]
        if pack:
            # resolve pfilter on the compacted tile: dr = base +
            # pfilters[idx] (no carry: pfilters < n_accept <=
            # 2^(4*(subk-drlevel)))
            mask = np.uint32((1 << (4 * (subk - drlevel))) - 1)
            idx = (vals & mask).astype(jnp.int32)
            vals = (vals & ~mask) + _lookup(prow, idx)
    # a real survivor whose final value equals the pad sentinel would
    # be indistinguishable from padding: force the exact-rerun path
    has_sentinel = jnp.sum((valid & (vals == jnp.uint32(SENT)))
                           .astype(jnp.int32))
    out_ref[0] = jnp.where(valid, vals, jnp.uint32(SENT))
    cnt_ref[pid] = jnp.where((has_sentinel > 0) | overflow,
                             jnp.int32(MAXS + 1), total)


@functools.partial(jax.jit,
                   static_argnames=("k", "subk", "drlevel", "nblocks",
                                    "n_accept", "use_bfs", "pack",
                                    "use_sig", "want_pos", "interpret"))
def sketch_tiles_compact_pallas(tiles, accept2d, pfil2d, lev2d,
                                sig2d=None, *, k, subk, drlevel, nblocks,
                                n_accept, use_bfs=False, pack=False,
                                use_sig=False, want_pos=False,
                                interpret=False):
    """tiles -> (survivors [nblocks, MAXS//LANES, LANES],
    dims, positions (same shape; meaningful only when use_sig /
    want_pos), counts [nblocks]).

    ``sig2d`` (required when use_sig): [R/2, 128] uint32 pair-packed
    low-16 run signatures (see _sig_tables).  With use_sig, counts are
    COARSE (signature false positives included) and the caller must
    verify (dim in run) on the host before trusting survivors.  With
    want_pos, the third output carries each survivor's window index
    within the dispatch (uint32).
    """
    TL = 2 * k
    ext = _ext(TL)
    if sig2d is None:
        sig2d = jnp.zeros((1, LANES), jnp.uint32)
    kern = functools.partial(_compact_kernel, k=k, subk=subk,
                             drlevel=drlevel, n_accept=n_accept,
                             use_bfs=use_bfs, pack=pack, use_sig=use_sig,
                             want_pos=want_pos)
    # unused channels shrink to a single padding row (want_pos/use_sig
    # are static, so the trace picks the cheap shape)
    dim_rows = MAXS // LANES if use_sig else 1
    pos_rows = MAXS // LANES if want_pos else 1
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, RWIN + ext, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, MAXS // LANES, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim_rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pos_rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, MAXS // LANES, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, dim_rows, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, pos_rows, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((nblocks,), jnp.int32),
        ],
        interpret=interpret,
    )(tiles, accept2d, pfil2d, lev2d, sig2d)


@functools.partial(jax.jit,
                   static_argnames=("k", "subk", "drlevel", "nblocks",
                                    "n_accept", "use_bfs", "interpret"))
def sketch_tiles_pallas(tiles, accept2d, pfil2d, lev2d, *, k, subk,
                        drlevel, nblocks, n_accept, use_bfs=False,
                        interpret=False):
    """tiles int32[nblocks, RWIN+ext, 128] -> (dr, keep) per window."""
    TL = 2 * k
    ext = _ext(TL)
    kern = functools.partial(_kernel, k=k, subk=subk, drlevel=drlevel,
                             n_accept=n_accept, use_bfs=use_bfs)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, RWIN + ext, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RWIN, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RWIN, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, RWIN, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, RWIN, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(tiles, accept2d, pfil2d, lev2d)


@functools.partial(jax.jit, static_argnames=("nblocks", "TL"))
def _restructure(c32_flat, *, nblocks, TL):
    """Flat per-base int32 codes (invalid=4) -> column-major window tiles
    [nblocks, RWIN+ext, 128]; pure reshape/transpose, no gathers."""
    ext = _ext(TL)
    S = nblocks * LANES
    M = S * RWIN
    pad_len = M + RWIN + ext - c32_flat.shape[0]
    c2 = jnp.concatenate([
        c32_flat, jnp.full((max(pad_len, 0),), 4, jnp.int32)])
    v0 = c2[:M].reshape(S, RWIN)
    v1 = c2[RWIN:M + RWIN].reshape(S, RWIN)[:, :ext]
    strips = jnp.concatenate([v0, v1], axis=1)        # [S, RWIN+ext]
    return strips.reshape(nblocks, LANES, RWIN + ext).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("nblocks", "TL", "n"))
def _restructure_packed(packed, vmask, *, nblocks, TL, n):
    """2-bit packed codes + validity bitmask (see sketch_xla.pack_codes)
    -> column-major window tiles, unpacked on device.  Cuts host->device
    traffic 16x vs shipping int32 codes."""
    ext = _ext(TL)
    S = nblocks * LANES
    M = S * RWIN
    sh16 = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    c = ((packed[:, None] >> sh16) & np.uint32(3)).reshape(-1)[:n]
    sh32 = jnp.arange(32, dtype=jnp.uint32)[None, :]
    v = (((vmask[:, None] >> sh32) & np.uint32(1)) != 0).reshape(-1)[:n]
    c32 = jnp.where(v, c.astype(jnp.int32), 4)
    v0 = c32[:M].reshape(S, RWIN)
    v1 = c32[RWIN:M + RWIN].reshape(S, RWIN)[:, :ext]
    strips = jnp.concatenate([v0, v1], axis=1)        # [S, RWIN+ext]
    return strips.reshape(nblocks, LANES, RWIN + ext).transpose(0, 2, 1)


# nblocks buckets bound distinct compiled shapes; max = 512 blocks =
# 512*RWIN*128 windows per dispatch -- 16.7M at the RWIN=256 default
# (larger streams loop with TL-1 overlap)
_NB_BUCKETS = (1, 4, 16, 64, 256, 512)


def _nb_bucket(nb: int) -> int:
    for b in _NB_BUCKETS:
        if nb <= b:
            return b
    return _NB_BUCKETS[-1]


def _greedy_plan(nb_needed: int) -> list:
    """Split nb_needed blocks into bucket-sized dispatches, trading
    padded (wasted) windows against dispatch count: round up to one
    bucket when the waste is <= 25%, else emit the largest bucket that
    fits and recurse on the remainder."""
    plan = []
    rem = nb_needed
    while rem > 0:
        if rem >= _NB_BUCKETS[-1]:
            plan.append(_NB_BUCKETS[-1])
            rem -= _NB_BUCKETS[-1]
            continue
        hi = _nb_bucket(rem)           # smallest bucket >= rem
        if hi * 3 <= rem * 4:          # <= 33% padding: finish in one
            plan.append(hi)
            break
        lo = max(b for b in _NB_BUCKETS if b <= rem)
        plan.append(lo)
        rem -= lo
    return plan


@functools.partial(jax.jit, static_argnames=("max_out",))
def _compact(dr, keep, max_out: int):
    flat = dr.reshape(-1)
    srt = jnp.sort(flat)
    return srt[:max_out], jnp.sum(keep)


@jax.jit
def _sort_flat(surv):
    """Sort all survivor slots; SENT pads sort to the back (uint32)."""
    return jnp.sort(surv.reshape(-1))


@jax.jit
def _sort_flat_pairs(surv, dims):
    """Sort (value, dim) survivor pairs by value, keeping the pairing;
    SENT pads sort to the back."""
    return jax.lax.sort((surv.reshape(-1), dims.reshape(-1)), num_keys=1)


@jax.jit
def _sort_flat_triples(surv, dims, poss):
    """Sort (value, dim, window) survivor triples by value; SENT pads
    sort to the back."""
    return jax.lax.sort((surv.reshape(-1), dims.reshape(-1),
                         poss.reshape(-1)), num_keys=1)


def sketch_codes_pallas(codes: np.ndarray, shuf, accept=None,
                        interpret: bool = False, compact: bool = True,
                        devices=None, with_positions: bool = False):
    """codes uint8 -> (sorted survivor drtuples uint32, count) on device.

    With ``with_positions`` (requires the signature-probe mode; returns
    None otherwise so the caller can fall back to the XLA path):
    -> (drtuples uint32, window positions int64), UNSORTED, duplicates
    preserved — the contract of sketch_codes_with_positions.

    Returns None if the configuration is unsupported (fallback to the
    XLA path): k - drlevel > 8 or accept table not lane-aligned.
    With ``compact`` (default) survivors are extracted inside the kernel
    (no global sort, MAXS per block); overflowing blocks re-run through
    the full-output path.

    ``devices``: explicit list of JAX devices to round-robin chunks
    across (sketching is embarrassingly parallel over the window
    stream; each ~33M-window dispatch is independent, so a colocated
    pod scales stage-I linearly with no collectives).  Default: all
    local devices when there is more than one and the stream spans
    multiple chunks (MKSSD_PALLAS_NDEV caps it; 1 disables).
    """
    p = shuf.params
    TL = p.kmer_len
    if p.k - p.drlevel > 8:
        return None
    if accept is None:
        accept = shuf.device_tables()
    a_tups, a_pf = accept[0], accept[1]
    n_accept = a_tups.size
    if n_accept % LANES != 0 or n_accept < LANES or n_accept > (1 << 14):
        # degenerate low-reduction configs (huge accept tables) go
        # through the XLA path; the in-VMEM select chains scale ~n/128
        return None

    # BFS splitter levels need a power-of-two table; the packed-index
    # compaction additionally needs the index to fit the drtuple's zero
    # low bits (true for every 16^(subk-drlevel) >= 4096 config)
    use_bfs, pack, use_sig = kernel_modes(p, n_accept)
    if with_positions and not (use_sig and compact):
        # before any device staging: the caller falls back to XLA
        return None

    from metakssd_tpu.ops.sketch_xla import pack_codes

    a2d = jnp.asarray(a_tups.reshape(-1, LANES))
    p2d = jnp.asarray(a_pf.reshape(-1, LANES))
    lev2d = jnp.asarray(_bfs_levels(a_tups) if use_bfs
                        else np.zeros((1, LANES), np.uint32))
    sig2d = jnp.asarray(_sig_tables(a_tups)) if use_sig else None
    ext = _ext(TL)
    BW = RWIN * LANES
    nwin_total = max(codes.size - TL + 1, 0)

    parts = []
    parts_pos = []
    plan = _greedy_plan(max(-(-nwin_total // BW), 1))
    starts = [0]
    for nb in plan[:-1]:
        starts.append(starts[-1] + nb * BW)

    # round-robin chunks across local devices (stage-I scales linearly:
    # independent dispatches, no collectives; survivors merge on host)
    if devices is not None and len(devices) == 0:
        devices = None
    if devices is None and len(plan) > 1:
        try:
            devs = jax.local_devices()
        except Exception:
            devs = []
        cap = int(os.environ.get("MKSSD_PALLAS_NDEV", "0") or 0)
        if cap > 0:
            devs = devs[:cap]
        devices = devs if len(devs) > 1 else None
    ndev = len(devices) if devices else 1

    tab_cache = {}

    def _tabs_for(dev):
        """Replicated filter tables for one device (staged once)."""
        if dev not in tab_cache:
            tab_cache[dev] = tuple(
                None if t is None else jax.device_put(t, dev)
                for t in (a2d, p2d, lev2d, sig2d))
        return tab_cache[dev]

    # Pipelined dispatch: queue chunk transfers + kernels without host
    # syncs so h2d of chunk i+1 overlaps chunk i's compute, but bound the
    # number of in-flight chunks — each max chunk's tiles are ~75 MB of
    # HBM at RWIN=256 (512 blocks x [288,128] int32)
    # and must be dropped as soon as its counts come back clean.
    DEPTH = 2

    if use_sig:
        # host-side exact verify tables for the signature-probe path
        R = n_accept // LANES
        runs_host = np.asarray(a_tups).reshape(LANES, R)
        pfil_host = np.asarray(a_pf).astype(np.uint32)

    def _host_verify(v, d):
        """Exact verify of coarse survivor pairs — (base|pos7, dim)
        when pack, (base, dim|pos7<<4subk) otherwise: rank dim within
        run pos7, drop signature false positives, resolve the pfilter.
        ~0.03% of windows reach here."""
        if pack:
            pos7 = (v & np.uint32(LANES - 1)).astype(np.int64)
            base = v - pos7.astype(np.uint32)
        else:
            pos7 = (d >> np.uint32(4 * p.subk)).astype(np.int64)
            d = d & np.uint32((1 << (4 * p.subk)) - 1)
            base = v
        cand = runs_host[pos7]                       # [m, R]
        hit = (cand == d[:, None]).any(axis=1)
        pos7 = pos7[hit]
        rank = (cand[hit] < d[hit, None]).sum(axis=1)
        dr = base[hit] + pfil_host[pos7 * R + rank]
        return (dr, hit) if with_positions else dr

    def _emit(dr, win, start):
        """Append one resolved survivor batch (win = dispatch-relative
        window indices, already hit-filtered, or None)."""
        parts.append(dr)
        if with_positions:
            parts_pos.append(win.astype(np.int64) + start)

    def _resolve(entry):
        start, tiles, tabs, kw, surv, dims, poss, counts, flat, dflat, \
            pflat = entry
        ta2d, tp2d, tlev2d, _ = tabs
        nblocks = kw["nblocks"]
        if counts is not None:
            counts = np.asarray(counts).reshape(-1)
            bad = [b for b in range(nblocks) if counts[b] > MAXS]
            if not bad:
                total = int(counts.sum())
                if total:
                    # read back a power-of-two-bucketed prefix: a slice
                    # sized by the exact data-dependent count would
                    # compile a fresh XLA slice per run
                    take = min(1 << max(total - 1, 1).bit_length(),
                               flat.size)
                    if use_sig:
                        v = np.asarray(flat[:take])[:total]
                        d = np.asarray(dflat[:take])[:total]
                        res = _host_verify(v, d)
                        if with_positions:
                            dr, hit = res
                            w = np.asarray(pflat[:take])[:total][hit]
                            _emit(dr, w, start)
                        else:
                            parts.append(res)
                    else:
                        parts.append(np.asarray(flat[:take])[:total])
                return
            # mixed chunk: salvage good blocks from the unsorted tile,
            # rerun bad ones through the exact full-output kernel —
            # per overflowing BLOCK (nblocks=1 slice), not the whole
            # chunk: a full-output rerun of a 256-block chunk reads
            # back 2x the entire window tile (~134 MB/16.7M windows)
            surv = np.asarray(surv).reshape(nblocks, -1)
            if use_sig:
                dims = np.asarray(dims).reshape(nblocks, -1)
            if with_positions:
                poss = np.asarray(poss).reshape(nblocks, -1)
            for b in range(nblocks):
                if counts[b] > MAXS:
                    continue
                m = surv[b] != np.uint32(SENT)
                if use_sig:
                    res = _host_verify(surv[b][m], dims[b][m])
                    if with_positions:
                        dr, hit = res
                        _emit(dr, poss[b][m][hit], start)
                    else:
                        parts.append(res)
                else:
                    parts.append(surv[b][m])
            kw1 = dict(kw, nblocks=1)
            for b in bad:
                dr, keep = sketch_tiles_pallas(
                    jax.lax.slice_in_dim(tiles, b, b + 1, axis=0),
                    ta2d, tp2d, tlev2d, **kw1)
                keep = np.asarray(keep)[0].astype(bool)
                dr = np.asarray(dr)[0][keep]
                if with_positions:
                    r_idx, l_idx = np.nonzero(keep)
                    _emit(dr, (b * RWIN * LANES + l_idx * RWIN
                               + r_idx).astype(np.int64), start)
                else:
                    parts.append(dr)
            return
        dr, keep = sketch_tiles_pallas(tiles, ta2d, tp2d, tlev2d, **kw)
        dr = np.asarray(dr)
        keep = np.asarray(keep).astype(bool)
        parts.extend(dr[b][keep[b]] for b in range(nblocks))

    from metakssd_tpu.io import native as native_io

    pending = []
    for i, (start, nblocks) in enumerate(zip(starts, plan)):
        nw_real = min(nblocks * BW, max(nwin_total - start, 0))
        need = nblocks * BW + RWIN + ext
        # one-pass native 2-bit pack straight from the code stream (no
        # intermediate host copy); positions past the stream (and the
        # strip slack no window reads) pack as invalid, matching the
        # 255-padded host fallback
        pk = native_io.pack_range(codes, start, need)
        if pk is None:
            buf = np.full(need, 255, np.uint8)
            seg = codes[start:start + nw_real + TL - 1]
            buf[:seg.size] = seg
            pk = pack_codes(buf)
        packed, vmask = pk
        if devices is not None:
            dev = devices[i % ndev]
            packed = jax.device_put(packed, dev)
            vmask = jax.device_put(vmask, dev)
            ta2d, tp2d, tlev2d, tsig2d = _tabs_for(dev)
        else:
            packed, vmask = jnp.asarray(packed), jnp.asarray(vmask)
            ta2d, tp2d, tlev2d, tsig2d = a2d, p2d, lev2d, sig2d
        tiles = _restructure_packed(packed, vmask,
                                    nblocks=nblocks, TL=TL, n=need)
        kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nblocks=nblocks,
                  n_accept=n_accept, use_bfs=use_bfs,
                  interpret=interpret)
        tabs = (ta2d, tp2d, tlev2d, tsig2d)
        if compact:
            surv, dims, poss, counts = sketch_tiles_compact_pallas(
                tiles, ta2d, tp2d, tlev2d, tsig2d, pack=pack,
                use_sig=use_sig, want_pos=with_positions, **kw)
            # device-side sort pushes pad sentinels to the back so the
            # host reads back only the exact survivor prefix (~2% of
            # the tile) instead of the whole thing
            pflat = None
            if use_sig and with_positions:
                flat, dflat, pflat = _sort_flat_triples(surv, dims, poss)
            elif use_sig:
                flat, dflat = _sort_flat_pairs(surv, dims)
            else:
                flat, dflat = _sort_flat(surv), None
            pending.append((start, tiles, tabs, kw, surv, dims, poss,
                            counts, flat, dflat, pflat))
        else:
            pending.append((start, tiles, tabs, kw, None, None, None,
                            None, None, None, None))
        while len(pending) > DEPTH * ndev:
            _resolve(pending.pop(0))

    while pending:
        _resolve(pending.pop(0))

    out = np.concatenate(parts) if parts else np.zeros(0, np.uint32)
    if with_positions:
        wpos = np.concatenate(parts_pos) if parts_pos else \
            np.zeros(0, np.int64)
        return out, wpos
    out.sort()
    return out, out.size
