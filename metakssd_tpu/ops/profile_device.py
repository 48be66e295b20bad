"""Device-resident composite profiling reduction.

The colocated-TPU deployment shape of get_species_abundance (reference
command_composite.c:446-649).  The algorithmic shape matters on TPU:
a full sweep over the DB's postings with a per-posting ``searchsorted``
measured 7 Mpostings/s on v5e (every search step is a dynamic gather,
~100M gathers/s, and 17 steps x 43M postings dwarf the work) — so, like
the host path, only *matched* postings are touched:

  * query-side membership runs on the HOST (a 65K-needle searchsorted
    into the distinct-k-mer array is sub-ms and its output is tiny);
  * the device expands the matched rows' postings into a static
    [bucket, Lmax] tile (one 2M-element gather), sorts the (genome,
    abundance) pairs with ONE ``lax.sort``, and reduces counts /
    abundance sums / median / max / 98-99th-percentile windows with
    byte-split u32 prefix sums differenced at the genome bounds;
  * the reference's quirky 1-based s1 indexing with s1[0] = n
    (command_composite.c:596-613, mirrored by
    native/postings.cpp:postings_group_stats) is reproduced exactly,
    including the cnt==0 lastn=1 case.  Percentile window bounds are
    C-double semantics, computed on the host in float64 from the
    fetched counts between the two device dispatches.

``Lmax`` (the static posting-row width) is the DB's longest row, capped
at 128; a query matching a longer row returns None and the caller falls
back to the host kernels — marker k-mers shared by >128 genomes are
poor markers, so real MarkerDBs rarely trip this.

Single-device only: the multi-chip path (parallel.mesh.ShardedMatchIndex)
keeps its host-side stats, and multi-component DBs fall back to the host
kernels (per-genome percentiles do not decompose across components).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

UINT32_MAX = 0xFFFFFFFF
LMAX_CAP = 128


def _bucket(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 6)


@functools.partial(jax.jit,
                   static_argnames=("nref", "lmax", "npost"))
def _stats_pass1(starts, gids, rows, ab, nm, *, nref, lmax, npost):
    import jax.numpy as jnp
    from jax import lax

    bucket = rows.shape[0]
    rvalid = jnp.arange(bucket) < nm
    rows_c = jnp.where(rvalid, rows, 0)
    st = jnp.take(starts, rows_c)
    en = jnp.take(starts, rows_c + 1)
    j = jnp.arange(lmax, dtype=jnp.int32)[None, :]
    gidx = st[:, None] + j
    valid = rvalid[:, None] & (gidx < en[:, None])
    g = jnp.where(valid,
                  jnp.take(gids, jnp.clip(gidx, 0, npost - 1)),
                  jnp.int32(nref))
    abf = jnp.where(valid, ab[:, None], jnp.uint32(0))

    gs, sab = lax.sort((g.reshape(-1), abf.reshape(-1)), num_keys=2)
    # genome segment bounds over the sorted pairs (sentinel g=nref last)
    bounds = jnp.searchsorted(gs, jnp.arange(nref + 1, dtype=jnp.int32))
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.uint32)

    # byte-split keeps per-genome sums exact (mod-2^32 diffs are exact
    # while the true segment sum < 2^32; each byte lane sums < cnt*255)
    csab_lo = jnp.concatenate([
        jnp.zeros(1, jnp.uint32),
        jnp.cumsum(sab & jnp.uint32(0xFF), dtype=jnp.uint32)])
    csab_hi = jnp.concatenate([
        jnp.zeros(1, jnp.uint32),
        jnp.cumsum(sab >> jnp.uint32(8), dtype=jnp.uint32)])
    sum_lo = jnp.take(csab_lo, bounds[1:]) - jnp.take(csab_lo, bounds[:-1])
    sum_hi = jnp.take(csab_hi, bounds[1:]) - jnp.take(csab_hi, bounds[:-1])

    n = counts.astype(jnp.int32)
    base = bounds[:-1]
    m = n // 2
    total = gs.shape[0]
    med_idx = jnp.clip(base + m - 1, 0, total - 1)
    median = jnp.where(m == 0, counts, jnp.take(sab, med_idx))
    max_idx = jnp.clip(bounds[1:] - 1, 0, total - 1)
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
    """Provider of the postings_group_stats tuple, computed on device
    from a single-component MarkerDB's inverted index staged in HBM."""

    def __init__(self, rk: np.ndarray, starts: np.ndarray,
                 gid_sorted: np.ndarray, nref: int):
        self.rk = np.asarray(rk, np.uint32)           # host: membership
        self.starts_h = np.asarray(starts, np.int64)
        self.nref = nref
        self.npost = int(gid_sorted.size)
        if self.npost >= 1 << 31:
            raise ValueError("device profiling supports < 2^31 postings")
        lens = np.diff(self.starts_h)
        self.lmax = int(min(lens.max() if lens.size else 1, LMAX_CAP))
        self.lmax = max(self.lmax, 1)
        self._long = lens > self.lmax                  # per-row fallback
        self._starts_d = jax.device_put(self.starts_h.astype(np.int32))
        self._gids_d = jax.device_put(
            np.asarray(gid_sorted, np.int32))

    def group_stats(self, qids_s: np.ndarray, qab_s: np.ndarray,
                    st_pctl: float, ed_pctl: float):
        """(count, sum, lastsum, lastn, median, max) int64 arrays of
        length nref — the exact postings_group_stats contract — or None
        when a matched posting row exceeds Lmax (caller falls back)."""
        import jax.numpy as jnp
        # host membership: tiny vs the postings sweep
        pos = np.searchsorted(self.rk, qids_s)
        pos_c = np.minimum(pos, max(self.rk.size - 1, 0))
        member = (self.rk.size > 0) & (self.rk[pos_c] == qids_s)
        rows = pos_c[member].astype(np.int32)
        if rows.size and self._long[rows].any():
            return None
        abm = np.asarray(qab_s)[member].astype(np.uint32)
        nm = int(rows.size)
        bucket = _bucket(max(nm, 1))
        rpad = np.zeros(bucket, np.int32)
        rpad[:nm] = rows
        apad = np.zeros(bucket, np.uint32)
        apad[:nm] = abm
        counts, slo, shi, med, mx, base, clo, chi = _stats_pass1(
            self._starts_d, self._gids_d, jnp.asarray(rpad),
            jnp.asarray(apad), jnp.asarray(np.int32(nm)),
            nref=self.nref, lmax=self.lmax, npost=self.npost)
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
