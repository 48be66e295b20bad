"""Device (JAX/XLA) KSSD sketch kernel.

TPU-first re-design of the reference per-base hash loop
(reference iseq2comem.c:240-311): instead of a rolling scalar tuple and an
open-addressing hash table, every window's forward/revcomp tuples are
computed as vectorised (hi, lo) uint32 pairs; the shuffle-table filter is
evaluated against a tiny device-resident *accept table* (the sorted
~dim_end accepted substring values + their reduced codes) via vectorised
binary search — the 64 MiB shuffle table itself never leaves the host.
The sketch is produced by sorting the surviving drtuples: unique /
counting / component split all fall out of the sorted order.

Layout contract: chunks are processed with a TL-1 code overlap so each
window is evaluated exactly once; outputs are uint64 keys
``drtuple`` for valid windows and ``SENTINEL`` elsewhere, sorted
ascending, so the host (or downstream device code) can merge chunks and
take unique+counts in linear time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from metakssd_tpu.formats.shuf import DimShuffle

SENTINEL = np.uint64(0xFFFF_FFFF_FFFF_FFFF)

# Chunk-size buckets bound the number of distinct compiled shapes.
_CHUNK_BUCKETS = (1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 22)
_MAX_CHUNK = _CHUNK_BUCKETS[-1]
# The compact path processes the whole stream in one dispatch up to this
# many windows (intermediates ~32 B/window of HBM).
_COMPACT_BUCKETS = (1 << 16, 1 << 18, 1 << 20, 1 << 22, 1 << 24,
                    1 << 25, 1 << 26, 1 << 27)
_MAX_COMPACT = _COMPACT_BUCKETS[-1]


def _window_tuples(c32: jnp.ndarray, nwin: int, TL: int):
    """(fwd_hi, fwd_lo, rc_hi, rc_lo) uint32 for every window.

    Window w covers codes [w, w+TL).  Base at offset j inside the window
    sits at bit 2*(TL-1-j) of the forward tuple and bit 2*j of the
    revcomp tuple (reference iseq2comem.c:253-254).
    """
    z = jnp.zeros((nwin,), jnp.uint32)
    fwd_hi, fwd_lo, rc_hi, rc_lo = z, z, z, z
    for j in range(TL):
        seg = jax.lax.dynamic_slice(c32, (j,), (nwin,))
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
    return fwd_hi, fwd_lo, rc_hi, rc_lo


def _extract_field(hi: jnp.ndarray, lo: jnp.ndarray, shift: int, bits: int):
    """bits [shift, shift+bits) of the 64-bit (hi,lo) value, as uint32."""
    assert bits <= 32
    if shift == 0:
        v = lo
    elif shift < 32:
        v = (lo >> np.uint32(shift)) | (hi << np.uint32(32 - shift))
    else:
        v = hi >> np.uint32(shift - 32)
    if bits == 32:
        return v
    return v & np.uint32((1 << bits) - 1)


@functools.partial(jax.jit, static_argnames=("k", "subk", "drlevel",
                                             "nwin", "search_method"))
def _sketch_chunk(codes: jnp.ndarray, accept_tups: jnp.ndarray,
                  pfilters: jnp.ndarray, *, k: int, subk: int, drlevel: int,
                  nwin: int, search_method: str = "scan_unrolled"):
    """codes uint8[nwin + TL - 1] -> (drtuple uint32[nwin], keep mask).

    Restricted to k - drlevel <= 8 (single component, 32-bit drtuples) —
    the published configurations; wider configs use the host fallback.
    """
    TL = 2 * k
    outctx = k - subk
    assert k - drlevel <= 8, "device path supports 32-bit drtuples"

    is_valid = codes < np.uint8(4)
    c32 = jnp.where(is_valid, codes, 0).astype(jnp.uint32)

    fwd_hi, fwd_lo, rc_hi, rc_lo = _window_tuples(c32, nwin, TL)

    take_fwd = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo <= rc_lo))
    uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)

    # window validity: all TL codes valid <=> no reset in [w, w+TL)
    idx = jnp.arange(is_valid.shape[0], dtype=jnp.int32)
    last_reset = jax.lax.cummax(jnp.where(is_valid, np.int32(-1), idx))
    win_ok = jax.lax.dynamic_slice(last_reset, (TL - 1,), (nwin,)) < \
        jnp.arange(nwin, dtype=jnp.int32)

    # inner substring -> accept-table lookup
    dim_tup = _extract_field(uni_hi, uni_lo, 2 * outctx, 4 * subk)
    pos = jnp.searchsorted(accept_tups, dim_tup, side="left",
                           method=search_method)
    pos = jnp.minimum(pos, accept_tups.shape[0] - 1)
    hit = accept_tups[pos] == dim_tup
    pf = pfilters[pos]

    # drtuple = (left_outer ++ right_outer) << 4*(subk-drlevel) + pfilter
    # (algebraically identical to reference iseq2comem.c:291-294; fits in
    # uint32 because k - drlevel <= 8 here)
    top = _extract_field(uni_hi, uni_lo, 4 * k - 2 * outctx, 2 * outctx)
    right = uni_lo & np.uint32((1 << (2 * outctx)) - 1) if outctx else \
        jnp.zeros_like(uni_lo)
    combined = (top << np.uint32(2 * outctx)) | right
    drtuple = (combined << np.uint32(4 * (subk - drlevel))) + pf

    keep = win_ok & hit
    return drtuple, keep


def pack_codes(chunk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side 2-bit packing: uint8 codes -> (packed u32[n/16] of 16
    bases/word little-endian, validity bitmask u32[n/32]).  Cuts
    host->device traffic ~3.6x; the kernel unpacks with shifts."""
    n = chunk.size
    npad = -(-n // 32) * 32
    c = np.full(npad, 255, dtype=np.uint8)
    c[:n] = chunk
    valid = c < 4
    c = np.where(valid, c, 0)
    # byte-strided pack: base i -> bits 2*(i mod 4) of byte i//4; viewing
    # the byte stream as little-endian u32 puts base i at bit 2*(i mod 16)
    b = (c[0::4] | (c[1::4] << 2) | (c[2::4] << 4) | (c[3::4] << 6))
    packed = b.view(np.uint32)
    vmask = np.packbits(valid, bitorder="little").view(np.uint32)
    return packed, vmask


def _unpack_codes(packed: jnp.ndarray, vmask: jnp.ndarray, n: int):
    """Device-side unpack -> (c32[n] with invalid as 0, is_valid[n])."""
    sh16 = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    c = ((packed[:, None] >> sh16) & np.uint32(3)).reshape(-1)[:n]
    sh32 = jnp.arange(32, dtype=jnp.uint32)[None, :]
    v = (((vmask[:, None] >> sh32) & np.uint32(1)) != 0).reshape(-1)[:n]
    return c, v


@functools.partial(jax.jit, static_argnames=("k", "subk", "drlevel",
                                             "nwin", "max_out"))
def _sketch_chunk_compact(packed, vmask, accept_mask, accept_tups,
                          pfilters, *, k, subk, drlevel, nwin, max_out):
    """Fast compacting kernel over 2-bit-packed input.

    The shuffle filter is ONE gather into the exact 2 MiB accept bitmask
    (vs 12 binary-search gathers per window); survivors compact to the
    front via sort_key_val; the reduced-substring code (pfilter) is then
    looked up for at most ``max_out`` survivors.  Only survivors leave
    the device.  Caller falls back to the full kernel if the survivor
    count exceeds max_out.
    """
    TL = 2 * k
    outctx = k - subk
    assert k - drlevel <= 8

    c32, is_valid = _unpack_codes(packed, vmask, nwin + TL - 1)
    fwd_hi, fwd_lo, rc_hi, rc_lo = _window_tuples(c32, nwin, TL)
    take_fwd = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo <= rc_lo))
    uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)

    idx = jnp.arange(is_valid.shape[0], dtype=jnp.int32)
    last_reset = jax.lax.cummax(jnp.where(is_valid, np.int32(-1), idx))
    win_ok = jax.lax.dynamic_slice(last_reset, (TL - 1,), (nwin,)) < \
        jnp.arange(nwin, dtype=jnp.int32)

    dim_tup = _extract_field(uni_hi, uni_lo, 2 * outctx, 4 * subk)
    word = accept_mask[(dim_tup >> np.uint32(5)).astype(jnp.int32)]
    hit = ((word >> (dim_tup & np.uint32(31))) & np.uint32(1)) != 0
    keep = win_ok & hit

    # drtuple without pfilter (pure vector ops)
    top = _extract_field(uni_hi, uni_lo, 4 * k - 2 * outctx, 2 * outctx)
    right = uni_lo & np.uint32((1 << (2 * outctx)) - 1) if outctx else \
        jnp.zeros_like(uni_lo)
    base = ((top << np.uint32(2 * outctx)) | right) << \
        np.uint32(4 * (subk - drlevel))

    # compact survivors to the front, sorted by dim_tup
    skey = jnp.where(keep, dim_tup, jnp.uint32(0xFFFFFFFF))
    skey_s, base_s = jax.lax.sort([skey, base], num_keys=1)
    cand = skey_s[:max_out]
    pos = jnp.searchsorted(accept_tups, cand, side="left",
                           method="scan_unrolled")
    pos = jnp.minimum(pos, accept_tups.shape[0] - 1)
    dr = base_s[:max_out] + pfilters[pos]
    return dr, jnp.sum(keep.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "subk", "drlevel",
                                             "nwin", "max_out"))
def _sketch_chunk_compact_pos(packed, vmask, accept_mask, accept_tups,
                              pfilters, *, k, subk, drlevel, nwin,
                              max_out):
    """Like _sketch_chunk_compact but also returns each survivor's
    window position (enables genome attribution in batched multi-genome
    sketching)."""
    TL = 2 * k
    outctx = k - subk
    c32, is_valid = _unpack_codes(packed, vmask, nwin + TL - 1)
    fwd_hi, fwd_lo, rc_hi, rc_lo = _window_tuples(c32, nwin, TL)
    take_fwd = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo <= rc_lo))
    uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)
    idx = jnp.arange(is_valid.shape[0], dtype=jnp.int32)
    last_reset = jax.lax.cummax(jnp.where(is_valid, np.int32(-1), idx))
    win_ok = jax.lax.dynamic_slice(last_reset, (TL - 1,), (nwin,)) < \
        jnp.arange(nwin, dtype=jnp.int32)
    dim_tup = _extract_field(uni_hi, uni_lo, 2 * outctx, 4 * subk)
    word = accept_mask[(dim_tup >> np.uint32(5)).astype(jnp.int32)]
    hit = ((word >> (dim_tup & np.uint32(31))) & np.uint32(1)) != 0
    keep = win_ok & hit
    top = _extract_field(uni_hi, uni_lo, 4 * k - 2 * outctx, 2 * outctx)
    right = uni_lo & np.uint32((1 << (2 * outctx)) - 1) if outctx else \
        jnp.zeros_like(uni_lo)
    base = ((top << np.uint32(2 * outctx)) | right) << \
        np.uint32(4 * (subk - drlevel))
    skey = jnp.where(keep, dim_tup, jnp.uint32(0xFFFFFFFF))
    wpos = jnp.arange(nwin, dtype=jnp.uint32)
    skey_s, base_s, pos_s = jax.lax.sort([skey, base, wpos], num_keys=1)
    cand = skey_s[:max_out]
    p_ = jnp.searchsorted(accept_tups, cand, side="left",
                          method="scan_unrolled")
    p_ = jnp.minimum(p_, accept_tups.shape[0] - 1)
    dr = base_s[:max_out] + pfilters[p_]
    return dr, pos_s[:max_out], jnp.sum(keep.astype(jnp.int32))


def _bucket(n: int, buckets=_CHUNK_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# Pallas auto-enable: on TPU the fused kernel is the fast path; a one-off
# canary run cross-checks it against the XLA kernel and disables it on
# any mismatch or compile failure (MKSSD_PALLAS=0 forces off, =1 forces
# on without the canary).
_PALLAS_STATE: dict = {"checked": False, "ok": False}


def _pallas_usable(shuf, accept) -> bool:
    import os
    mode = os.environ.get("MKSSD_PALLAS", "auto")
    if mode == "0":
        return False
    p = shuf.params
    if p.k - p.drlevel > 8 or p.dim_end % 128 != 0:
        return False
    if mode == "1":
        return True
    if _PALLAS_STATE["checked"]:
        return _PALLAS_STATE["ok"]
    _PALLAS_STATE["checked"] = True
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            _PALLAS_STATE["ok"] = False
            return False
        from metakssd_tpu.ops import sketch_pallas
        rng = np.random.default_rng(0)
        canary = rng.integers(0, 4, size=1 << 16).astype(np.uint8)
        res = sketch_pallas.sketch_codes_pallas(canary, shuf, accept=accept)
        if res is None:
            _PALLAS_STATE["ok"] = False
            return False
        from metakssd_tpu.ops import golden
        gold = np.sort(golden.window_drtuples(canary, shuf)).astype(np.uint32)
        _PALLAS_STATE["ok"] = (res[1] == gold.size and
                               np.array_equal(res[0], gold))
    except Exception:
        _PALLAS_STATE["ok"] = False
    return _PALLAS_STATE["ok"]


def _backend_policy() -> str:
    """MKSSD_BACKEND routing — see utils.backend_policy (moved there so
    host-only paths can consult it without importing jax)."""
    from metakssd_tpu.utils import backend_policy
    return backend_policy()


def sketch_codes(codes: np.ndarray, shuf: DimShuffle,
                 accept: tuple[np.ndarray, np.ndarray] | None = None,
                 stream_order: bool = False) -> np.ndarray:
    """Sketch a full code stream on device.

    Returns sorted uint64 drtuples with duplicates preserved, or, with
    ``stream_order=True``, the (positions, drtuples) of accepted windows
    in stream order (for per-read sketching).
    """
    p = shuf.params
    if p.k - p.drlevel > 8:
        from metakssd_tpu.ops import golden
        if stream_order:
            dr, pos = golden.window_drtuples(codes, shuf,
                                             return_positions=True)
            return pos, dr
        return np.sort(golden.window_drtuples(codes, shuf))

    if not stream_order and _backend_policy() == "cpu":
        from metakssd_tpu.io import native as native_io
        dr = native_io.sketch_cpu(codes, shuf, accept=accept)
        if dr is not None:
            dr.sort()
            return dr

    if accept is None:
        accept = shuf.device_tables()
    a_tups = jnp.asarray(accept[0])
    a_pf = jnp.asarray(accept[1])
    a_mask = jnp.asarray(accept[2]) if len(accept) > 2 else \
        jnp.asarray(shuf.accept_bitmask())

    TL = p.kmer_len
    n = codes.size
    if n < TL:
        return (np.zeros(0, np.uint64) if not stream_order
                else (np.zeros(0, np.int64), np.zeros(0, np.uint64)))

    if _pallas_usable(shuf, accept):
        from metakssd_tpu.ops import sketch_pallas
        if stream_order:
            # fused kernel + survivor position channel, host-sorted
            # back to stream order (per-read sketching contract)
            res = sketch_pallas.sketch_codes_pallas(
                codes, shuf, accept=accept, with_positions=True)
            if res is not None:
                dr, pos = res
                order = np.argsort(pos, kind="stable")
                return pos[order], dr[order].astype(np.uint64)
        else:
            res = sketch_pallas.sketch_codes_pallas(codes, shuf,
                                                    accept=accept)
            if res is not None:
                return res[0].astype(np.uint64)

    out_keys = []
    out_pos = []
    step = _MAX_COMPACT if not stream_order else _MAX_CHUNK
    for start in range(0, max(n - TL + 1, 1), step):
        nwin_real = min(step, n - TL + 1 - start)
        if not stream_order:
            # compact path: whole stream in as few dispatches as
            # possible, codes 2-bit packed, only survivors come back
            nwin = _bucket(nwin_real, _COMPACT_BUCKETS)
            chunk = np.full(nwin + TL - 1, 255, dtype=np.uint8)
            chunk[:nwin_real + TL - 1] = \
                codes[start:start + nwin_real + TL - 1]
            max_out = max(nwin >> 8, 1 << 12)
            packed, vmask = pack_codes(chunk)
            keys, count = _sketch_chunk_compact(
                jnp.asarray(packed), jnp.asarray(vmask), a_mask, a_tups,
                a_pf, k=p.k, subk=p.subk, drlevel=p.drlevel, nwin=nwin,
                max_out=max_out)
            count = int(count)
            if count <= max_out:
                out_keys.append(np.asarray(keys)[:count].astype(np.uint64))
                continue
            # fall through to the exact full kernel in _MAX_CHUNK pieces
        for s2 in range(start, start + nwin_real, _MAX_CHUNK):
            nw_real = min(_MAX_CHUNK, start + nwin_real - s2)
            nw = _bucket(nw_real, _CHUNK_BUCKETS)
            chunk = np.full(nw + TL - 1, 255, dtype=np.uint8)
            chunk[:nw_real + TL - 1] = codes[s2:s2 + nw_real + TL - 1]
            key, keep = _sketch_chunk(
                jnp.asarray(chunk), a_tups, a_pf,
                k=p.k, subk=p.subk, drlevel=p.drlevel, nwin=nw)
            key_np = np.asarray(key)
            kp = np.asarray(keep)
            if stream_order:
                pos = np.nonzero(kp)[0]
                out_pos.append(pos + s2)
                out_keys.append(key_np[pos].astype(np.uint64))
            else:
                out_keys.append(key_np[kp].astype(np.uint64))

    if stream_order:
        return (np.concatenate(out_pos) if out_pos else np.zeros(0, np.int64),
                np.concatenate(out_keys) if out_keys else np.zeros(0, np.uint64))
    dr = np.concatenate(out_keys) if out_keys else np.zeros(0, np.uint64)
    dr.sort()
    return dr


def sketch_codes_with_positions(codes: np.ndarray, shuf: DimShuffle,
                                accept=None
                                ) -> tuple[np.ndarray, np.ndarray]:
    """All accepted (drtuple, window position) pairs for a code stream.

    Used by batched multi-genome sketching: many inputs concatenate into
    one stream (RESET-separated) and survivors are attributed to genomes
    by position on the host.  Duplicates preserved; unsorted.
    """
    p = shuf.params
    if p.k - p.drlevel > 8:
        pos, dr = sketch_codes(codes, shuf, accept=accept,
                               stream_order=True)
        return dr.astype(np.uint64), pos
    if accept is None:
        accept = shuf.device_tables()
    if _pallas_usable(shuf, accept):
        # fused compact kernel with the survivor position channel
        # (~50x the XLA compact path; see ops/sketch_pallas.py)
        from metakssd_tpu.ops import sketch_pallas
        res = sketch_pallas.sketch_codes_pallas(
            codes, shuf, accept=accept, with_positions=True)
        if res is not None:
            dr, pos = res
            return dr.astype(np.uint64), pos
    a_tups = jnp.asarray(accept[0])
    a_pf = jnp.asarray(accept[1])
    a_mask = jnp.asarray(accept[2])
    TL = p.kmer_len
    n = codes.size
    if n < TL:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    out_dr, out_pos = [], []
    for start in range(0, max(n - TL + 1, 1), _MAX_COMPACT):
        nwin_real = min(_MAX_COMPACT, n - TL + 1 - start)
        nwin = _bucket(nwin_real, _COMPACT_BUCKETS)
        chunk = np.full(nwin + TL - 1, 255, dtype=np.uint8)
        chunk[:nwin_real + TL - 1] = codes[start:start + nwin_real + TL - 1]
        max_out = max(nwin >> 8, 1 << 12)
        packed, vmask = pack_codes(chunk)
        dr, wpos, count = _sketch_chunk_compact_pos(
            jnp.asarray(packed), jnp.asarray(vmask), a_mask, a_tups,
            a_pf, k=p.k, subk=p.subk, drlevel=p.drlevel, nwin=nwin,
            max_out=max_out)
        count = int(count)
        if count <= max_out:
            out_dr.append(np.asarray(dr)[:count].astype(np.uint64))
            out_pos.append(np.asarray(wpos)[:count].astype(np.int64) + start)
        else:  # overflow: exact fallback via the full kernel
            spos, sdr = sketch_codes(
                codes[start:start + nwin_real + TL - 1], shuf,
                accept=accept, stream_order=True)
            out_dr.append(sdr)
            out_pos.append(spos + start)
    return (np.concatenate(out_dr) if out_dr else np.zeros(0, np.uint64),
            np.concatenate(out_pos) if out_pos else np.zeros(0, np.int64))


from metakssd_tpu.ops.golden import sets_from_drtuples  # noqa: F401,E402 (moved to the jax-free module; re-exported for callers)


def sketch_to_sets(codes: np.ndarray, shuf: DimShuffle, mode: str = "set",
                   min_occ: int = 1,
                   accept: tuple[np.ndarray, np.ndarray] | None = None
                   ) -> list[tuple[np.ndarray, np.ndarray | None]]:
    """Device-accelerated equivalent of golden.sketch_sets."""
    dr = sketch_codes(codes, shuf, accept=accept)
    return sets_from_drtuples(dr, shuf.params, mode=mode, min_occ=min_occ)
