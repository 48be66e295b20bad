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
# hardware sweeps (power of two >= 8)
RWIN = int(os.environ.get("MKSSD_PALLAS_RWIN", 512))
LANES = 128

# BFS levels up to this many splitters resolve via a scalar select tree
# instead of a lane dynamic-gather.  v5e sweep (round 3): 0 (disabled)
# 3159 Mwin/s vs 32 -> 3026 / 64 -> 2998 — the gather wins on v5e, so
# the tree is off by default (kept env-tunable for other TPU gens).
_SELTREE_MAX = int(os.environ.get("MKSSD_PALLAS_SELTREE", 0))


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


def _window_compute(c_ref, accept_ref, pfil_ref, lev_ref, *,
                    k: int, subk: int, drlevel: int, n_accept: int):
    """Shared window math: -> (base uint32, pos int32, keep bool), each
    [RWIN, 128].  ``pos`` is the accept-table index of the window's inner
    substring (valid where keep); drtuple = base + pfilters[pos]."""
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
    if lev_ref is not None:
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
        # reach 2^32-1 (no reliance on the subk<8 invariant elsewhere)
        hit = jnp.where(pos == n_accept - 1, last == dim, lv == dim)
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
    return base, pos, keep


def _kernel(c_ref, accept_ref, pfil_ref, lev_ref, dr_ref, keep_ref, *,
            k: int, subk: int, drlevel: int, n_accept: int,
            use_bfs: bool):
    base, pos, keep = _window_compute(
        c_ref, accept_ref, pfil_ref, lev_ref if use_bfs else None,
        k=k, subk=subk, drlevel=drlevel, n_accept=n_accept)
    prow = [pfil_ref[v, :] for v in range(n_accept // LANES)]
    dr = base + _lookup(prow, pos)
    dr_ref[0] = jnp.where(keep, dr, jnp.uint32(0xFFFFFFFF))
    keep_ref[0] = keep.astype(jnp.int32)


# Survivor slots per lane.  Default from the round-3 v5e sweep: the
# compaction epilogue does one masked [RWIN,128] reduction per slot, and
# 16 -> 8 measured 474 -> 552 Mwin/s (RWIN 1024 exceeds the 16 MiB VMEM
# scoped limit; 256 ~= 512).  Expected survivors/lane = RWIN/4096, so 8
# keeps overflow (exact rerun path) negligible.
CSLOT = int(os.environ.get("MKSSD_PALLAS_CSLOT", 8))
MAXS = CSLOT * LANES  # compacted survivors per block (64K windows)
SENT = 0xFFFFFFFF


def _compact_kernel(c_ref, accept_ref, pfil_ref, lev_ref, out_ref,
                    cnt_ref, *, k: int, subk: int, drlevel: int,
                    n_accept: int, use_bfs: bool, pack: bool):
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
    """
    pid = pl.program_id(0)
    base, pos, keep = _window_compute(
        c_ref, accept_ref, pfil_ref, lev_ref if use_bfs else None,
        k=k, subk=subk, drlevel=drlevel, n_accept=n_accept)
    prow = [pfil_ref[v, :] for v in range(n_accept // LANES)]
    if pack:
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
    rows = []
    for j in range(CSLOT):
        sel = keep & (slot == j)
        rows.append(jnp.sum(jnp.where(sel, drv, 0), axis=0,
                            keepdims=True))
    vals = jax.lax.bitcast_convert_type(
        jnp.concatenate(rows, axis=0), jnp.uint32)      # [CSLOT, 128]
    if pack:
        # resolve pfilter on the compacted tile: dr = base + pfilters[idx]
        # (no carry: pfilters < n_accept <= 2^(4*(subk-drlevel)))
        mask = np.uint32((1 << (4 * (subk - drlevel))) - 1)
        idx = (vals & mask).astype(jnp.int32)
        vals = (vals & ~mask) + _lookup(prow, idx)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (CSLOT, LANES), 0)
    valid = j_idx < jnp.broadcast_to(lane_tot, (CSLOT, LANES))
    # a real survivor whose final drtuple equals the pad sentinel would
    # be indistinguishable from padding: force the exact-rerun path
    has_sentinel = jnp.sum((valid & (vals == jnp.uint32(SENT)))
                           .astype(jnp.int32))
    out_ref[0] = jnp.where(valid, vals, jnp.uint32(SENT))
    cnt_ref[pid] = jnp.where((has_sentinel > 0) | overflow,
                             jnp.int32(MAXS + 1), total)


@functools.partial(jax.jit,
                   static_argnames=("k", "subk", "drlevel", "nblocks",
                                    "n_accept", "use_bfs", "pack",
                                    "interpret"))
def sketch_tiles_compact_pallas(tiles, accept2d, pfil2d, lev2d, *, k,
                                subk, drlevel, nblocks, n_accept,
                                use_bfs=False, pack=False,
                                interpret=False):
    """tiles -> (survivors [nblocks, MAXS//LANES, LANES], counts [nblocks])."""
    TL = 2 * k
    ext = _ext(TL)
    kern = functools.partial(_compact_kernel, k=k, subk=subk,
                             drlevel=drlevel, n_accept=n_accept,
                             use_bfs=use_bfs, pack=pack)
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
            pl.BlockSpec((1, MAXS // LANES, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, MAXS // LANES, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((nblocks,), jnp.int32),
        ],
        interpret=interpret,
    )(tiles, accept2d, pfil2d, lev2d)


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
# 33.5M windows per dispatch (larger streams loop with TL-1 overlap)
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


def sketch_codes_pallas(codes: np.ndarray, shuf, accept=None,
                        interpret: bool = False, compact: bool = True):
    """codes uint8 -> (sorted survivor drtuples uint32, count) on device.

    Returns None if the configuration is unsupported (fallback to the
    XLA path): k - drlevel > 8 or accept table not lane-aligned.
    With ``compact`` (default) survivors are extracted inside the kernel
    (no global sort, MAXS per block); overflowing blocks re-run through
    the full-output path.
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

    from metakssd_tpu.ops.sketch_xla import pack_codes

    a2d = jnp.asarray(a_tups.reshape(-1, LANES))
    p2d = jnp.asarray(a_pf.reshape(-1, LANES))
    # BFS splitter levels need a power-of-two table; the packed-index
    # compaction additionally needs the index to fit the drtuple's zero
    # low bits (true for every 16^(subk-drlevel) >= 4096 config)
    use_bfs = (n_accept & (n_accept - 1)) == 0
    pack = use_bfs and (n_accept.bit_length() - 1) <= 4 * (p.subk -
                                                           p.drlevel)
    lev2d = jnp.asarray(_bfs_levels(a_tups) if use_bfs
                        else np.zeros((1, LANES), np.uint32))
    ext = _ext(TL)
    BW = RWIN * LANES
    nwin_total = max(codes.size - TL + 1, 0)

    parts = []
    plan = _greedy_plan(max(-(-nwin_total // BW), 1))
    starts = [0]
    for nb in plan[:-1]:
        starts.append(starts[-1] + nb * BW)

    # Pipelined dispatch: queue chunk transfers + kernels without host
    # syncs so h2d of chunk i+1 overlaps chunk i's compute, but bound the
    # number of in-flight chunks — each chunk's tiles are ~130 MB of HBM
    # and must be dropped as soon as its counts come back clean.
    DEPTH = 2

    def _resolve(entry):
        tiles, kw, surv, counts, flat = entry
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
                    parts.append(np.asarray(flat[:take])[:total])
                return
            # mixed chunk: salvage good blocks from the unsorted tile,
            # rerun bad ones through the exact full-output kernel
            surv = np.asarray(surv).reshape(nblocks, -1)
            parts.extend(surv[b][surv[b] != np.uint32(SENT)]
                         for b in range(nblocks) if counts[b] <= MAXS)
        else:
            bad = list(range(nblocks))
        dr, keep = sketch_tiles_pallas(tiles, a2d, p2d, lev2d, **kw)
        dr = np.asarray(dr)
        keep = np.asarray(keep).astype(bool)
        parts.extend(dr[b][keep[b]] for b in bad)

    from metakssd_tpu.io import native as native_io

    pending = []
    for start, nblocks in zip(starts, plan):
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
        tiles = _restructure_packed(jnp.asarray(packed),
                                    jnp.asarray(vmask),
                                    nblocks=nblocks, TL=TL, n=need)
        kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nblocks=nblocks,
                  n_accept=n_accept, use_bfs=use_bfs,
                  interpret=interpret)
        if compact:
            surv, counts = sketch_tiles_compact_pallas(
                tiles, a2d, p2d, lev2d, pack=pack, **kw)
            # device-side sort pushes pad sentinels to the back so the
            # host reads back only the exact survivor prefix (~2% of
            # the tile) instead of the whole thing
            flat = _sort_flat(surv)
            pending.append((tiles, kw, surv, counts, flat))
        else:
            pending.append((tiles, kw, None, None, None))
        while len(pending) > DEPTH:
            _resolve(pending.pop(0))

    while pending:
        _resolve(pending.pop(0))

    out = np.concatenate(parts) if parts else np.zeros(0, np.uint32)
    out.sort()
    return out, out.size
