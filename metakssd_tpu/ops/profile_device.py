"""Device-resident composite profiling reduction.

The colocated-TPU deployment shape of get_species_abundance (reference
command_composite.c:446-649): the MarkerDB's postings are staged in HBM
once in *genome-major* order, and each query's per-genome profile
statistics compute on device —

  * membership + per-posting matched abundance via one vectorized
    ``searchsorted`` against the (tiny) query sketch — no per-posting
    host expansion (the host path materialises every matched posting,
    ``composite._CompIndex.match``);
  * per-genome count and abundance sums as scatter-free u32 prefix sums
    differenced at the genome bounds (the ``sharded_shared_counts``
    trick; byte-split cumsums keep segment sums exact for any per-genome
    posting count < 2^24);
  * median / max / 98-99th-percentile window via ONE segmented sort
    (``lax.sort`` keyed on (genome, value)); the reference's quirky
    1-based s1 indexing with s1[0] = n (command_composite.c:596-613,
    mirrored by native/postings.cpp:postings_group_stats) is reproduced
    exactly, including the cnt==0 lastn=1 case.

The percentile window bounds are ``(int)(cnt*ST_PCTL)`` .. the largest i
with ``(double)i <= cnt*ED_PCTL`` — C double semantics, so they are
computed on the host in float64 from the fetched counts between the two
device dispatches (f32-on-device would round differently).

Single-device only: the multi-chip path (parallel.mesh.ShardedMatchIndex)
keeps its host-side stats, and multi-component DBs fall back to the host
kernels (per-genome percentiles do not decompose across components).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

UINT32_MAX = 0xFFFFFFFF


def _bucket(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 6)


@functools.partial(jax.jit, static_argnames=("nref", "npost"))
def _stats_pass1(post_k, post_g, gb, qids, qab, qlen, *, nref, npost):
    import jax.numpy as jnp
    from jax import lax

    nq = qlen[0]
    lo = jnp.searchsorted(qids, post_k, side="left")
    lo_c = jnp.minimum(lo, qids.shape[0] - 1)
    member = (jnp.take(qids, lo_c) == post_k) & (lo < nq)
    ab = jnp.where(member, jnp.take(qab, lo_c), jnp.uint32(0))

    def segsum(vals_u32):
        s = jnp.concatenate([jnp.zeros(1, jnp.uint32),
                             jnp.cumsum(vals_u32, dtype=jnp.uint32)])
        sb = jnp.take(s, gb)
        return sb[1:] - sb[:-1]

    counts = segsum(member.astype(jnp.uint32))
    # byte-split keeps per-genome sums exact (mod-2^32 diffs are exact
    # while the true segment sum < 2^32; each byte lane sums < cnt*255)
    sum_lo = segsum(ab & jnp.uint32(0xFF))
    sum_hi = segsum(ab >> jnp.uint32(8))

    # segmented ascending sort of matched values (unmatched zeros sort
    # first, so genome g's n matched values end the segment)
    _, sab = lax.sort((post_g, ab), num_keys=2)
    csab_lo = jnp.concatenate([
        jnp.zeros(1, jnp.uint32),
        jnp.cumsum(sab & jnp.uint32(0xFF), dtype=jnp.uint32)])
    csab_hi = jnp.concatenate([
        jnp.zeros(1, jnp.uint32),
        jnp.cumsum(sab >> jnp.uint32(8), dtype=jnp.uint32)])

    n = counts.astype(jnp.int32)
    seg_end = gb[1:]
    base = seg_end - n                     # first matched slot
    m = n // 2
    med_idx = jnp.clip(base + m - 1, 0, npost - 1)
    median = jnp.where(m == 0, counts, jnp.take(sab, med_idx))
    max_idx = jnp.clip(seg_end - 1, 0, npost - 1)
    maxv = jnp.where(n > 0, jnp.take(sab, max_idx), jnp.uint32(0))
    return counts, sum_lo, sum_hi, median, maxv, base, csab_lo, csab_hi


@jax.jit
def _stats_pass2(csab_lo, csab_hi, base, i0, iend):
    """Percentile-window sums over the sorted segments: sum of
    s1[max(i0,1)..iend] where s1[i] = sab[base+i-1] (the i==0 term, which
    is n itself, is added on the host)."""
    import jax.numpy as jnp
    a = base + jnp.maximum(i0, 1) - 1
    b = base + iend
    b = jnp.maximum(b, a)                  # empty window (iend < max(i0,1))
    wlo = jnp.take(csab_lo, b) - jnp.take(csab_lo, a)
    whi = jnp.take(csab_hi, b) - jnp.take(csab_hi, a)
    return wlo, whi


class DeviceProfileIndex:
    """Drop-in provider of the postings_group_stats tuple, computed on
    device from a single-component MarkerDB staged once in HBM."""

    def __init__(self, rk: np.ndarray, starts: np.ndarray,
                 gid_sorted: np.ndarray, nref: int):
        lens = np.diff(np.asarray(starts).astype(np.int64))
        post_k = np.repeat(np.asarray(rk, np.uint32), lens)
        post_g = np.asarray(gid_sorted, np.int64)
        order = np.argsort(post_g, kind="stable")
        post_k = post_k[order]
        post_g = post_g[order]
        gb = np.zeros(nref + 1, dtype=np.int64)
        np.cumsum(np.bincount(post_g, minlength=nref), out=gb[1:])
        self.npost = int(post_k.size)
        self.nref = nref
        if self.npost >= 1 << 31:
            raise ValueError("device profiling supports < 2^31 postings")
        # pad to an 8-multiple; pads sort last (genome id nref) and sit
        # past gb[nref], outside every segment window
        pad = -(-max(self.npost, 8) // 8) * 8 - self.npost
        self._post_k = jax.device_put(np.concatenate(
            [post_k, np.full(pad, UINT32_MAX, np.uint32)]))
        self._post_g = jax.device_put(np.concatenate(
            [post_g, np.full(pad, nref)]).astype(np.int32))
        self._gb = jax.device_put(gb.astype(np.int32))

    def group_stats(self, qids_s: np.ndarray, qab_s: np.ndarray,
                    st_pctl: float, ed_pctl: float):
        """(count, sum, lastsum, lastn, median, max) int64 arrays of
        length nref — the exact postings_group_stats contract."""
        import jax.numpy as jnp
        nq = int(qids_s.size)
        bucket = _bucket(max(nq, 1))
        qpad = np.full(bucket, UINT32_MAX, np.uint32)
        qpad[:nq] = qids_s
        apad = np.zeros(bucket, np.uint32)
        apad[:nq] = qab_s
        counts, slo, shi, med, mx, base, clo, chi = _stats_pass1(
            self._post_k, self._post_g, self._gb,
            jnp.asarray(qpad), jnp.asarray(apad),
            jnp.asarray(np.array([nq], np.int32)),
            nref=self.nref, npost=int(self._post_k.shape[0]))
        counts = np.asarray(counts).astype(np.int64)
        # C-double percentile window bounds from the fetched counts
        i0 = (counts * st_pctl).astype(np.int64)       # (int)(cnt*st)
        iend = np.floor(counts * ed_pctl).astype(np.int64)
        wlo, whi = _stats_pass2(clo, chi, base,
                                jnp.asarray(i0.astype(np.int32)),
                                jnp.asarray(iend.astype(np.int32)))
        wsum = (np.asarray(wlo).astype(np.int64)
                + (np.asarray(whi).astype(np.int64) << 8))
        lastn = np.maximum(iend - i0 + 1, 0)
        lastsum = wsum + np.where(i0 == 0, counts, 0)
        sums = (np.asarray(slo).astype(np.int64)
                + (np.asarray(shi).astype(np.int64) << 8))
        return (counts, sums, lastsum, lastn,
                np.asarray(med).astype(np.int64),
                np.asarray(mx).astype(np.int64))
