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

Posting rows are split into fixed-width (``SUBW``) *subrows* at staging,
so arbitrarily long rows (a k-mer shared by thousands of genomes) fit
the static expansion tile with bounded padding — no fallback path.

Multi-component MarkerDBs stage one GLOBAL subrow table over the
concatenated per-component postings (the statistics depend only on the
matched (genome, abundance) pairs, never on the k-mer values, so
component-local matched rows simply map to global row ids and batch
into one dispatch).  Single-device only: the multi-chip path
(parallel.mesh.ShardedMatchIndex) keeps its host-side stats.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

UINT32_MAX = 0xFFFFFFFF
SUBW = 8          # subrow width: expansion tile is [n_subrows, SUBW]


def _bucket(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 6)


class SubrowTable:
    """Posting rows re-cut into <=SUBW-wide subrows (host metadata +
    device-staged start/end/gid arrays), shared by the profiling and
    dist device reductions."""

    def __init__(self, starts: np.ndarray, gid_sorted: np.ndarray,
                 sharding=None, put=None):
        """sharding: optional jax Sharding for the staged arrays (pass a
        replicated NamedSharding on a multi-device mesh so shard_map
        consumers don't reshard per dispatch).  put: optional staging
        override (multi-host callers pass mesh.host_to_global — plain
        device_put cannot target non-addressable devices)."""
        starts = np.asarray(starts, np.int64)
        lens = np.diff(starts)
        nsub_row = -(-lens // SUBW)                       # 0 for empty rows
        self.sub0 = np.zeros(starts.size, np.int64)
        np.cumsum(nsub_row, out=self.sub0[1:])
        nsub = int(self.sub0[-1])
        # subrow s of row r starts at starts[r] + k*SUBW
        rows_of_sub = np.repeat(np.arange(lens.size), nsub_row)
        k = (np.arange(nsub, dtype=np.int64)
             - self.sub0[rows_of_sub])
        sst = starts[rows_of_sub] + k * SUBW
        sen = np.minimum(sst + SUBW, starts[rows_of_sub + 1])
        self.npost = int(gid_sorted.size)
        if self.npost >= 1 << 31:
            raise ValueError("device reduction supports < 2^31 postings")
        if nsub == 0:                     # dummy empty subrow: gathers
            sst = np.zeros(1, np.int64)   # stay in-bounds, en-st == 0
            sen = np.zeros(1, np.int64)   # masks everything invalid
        if put is None:
            put = (lambda a: jax.device_put(a, sharding)) if sharding \
                else jax.device_put
        self._sst_d = put(sst.astype(np.int32))
        self._sen_d = put(sen.astype(np.int32))
        self._gids_d = put(
            np.asarray(gid_sorted, np.int32) if self.npost
            else np.zeros(1, np.int32))

    def expand_rows(self, rows: np.ndarray, payload: np.ndarray):
        """Host-side row -> subrow expansion: (subrow idx, payload)."""
        c0, c1 = self.sub0[rows], self.sub0[rows + 1]
        cnt = c1 - c0
        total = int(cnt.sum())
        bnd = np.zeros(rows.size, np.int64)
        np.cumsum(cnt[:-1], out=bnd[1:])
        sub = (np.arange(total, dtype=np.int64)
               - np.repeat(bnd, cnt) + np.repeat(c0, cnt)).astype(np.int32)
        return sub, np.repeat(np.asarray(payload), cnt)


def _expand_tile(sst, sen, gids, subs, nm, *, nref, npost):
    """[bucket, SUBW] (genome id | nref-sentinel) tile of the matched
    subrows' postings."""
    import jax.numpy as jnp
    bucket = subs.shape[0]
    rvalid = jnp.arange(bucket) < nm
    subs_c = jnp.where(rvalid, subs, 0)
    st = jnp.take(sst, subs_c)
    en = jnp.take(sen, subs_c)
    j = jnp.arange(SUBW, dtype=jnp.int32)[None, :]
    gidx = st[:, None] + j
    valid = rvalid[:, None] & (gidx < en[:, None])
    g = jnp.where(valid,
                  jnp.take(gids, jnp.clip(gidx, 0, npost - 1)),
                  jnp.int32(nref))
    return g, valid


@functools.partial(jax.jit, static_argnames=("nref", "npost"))
def _stats_pass1(sst, sen, gids, subs, ab, nm, *, nref, npost):
    import jax.numpy as jnp
    from jax import lax

    g, valid = _expand_tile(sst, sen, gids, subs, nm,
                            nref=nref, npost=npost)
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
    from a MarkerDB's inverted index staged in HBM (all components
    concatenated into one global posting/subrow table)."""

    def __init__(self, comps: list, nref: int):
        """comps: per-component (rk, starts, gid_sorted) tuples (None
        entries allowed for empty components)."""
        self.nref = nref
        self.rks = []                      # host: per-component membership
        self.row_off = []                  # component row id offsets
        starts_all = [np.zeros(1, np.int64)]
        gids_all = []
        off_rows = 0
        off_post = 0
        for comp in comps:
            if comp is None:
                self.rks.append(None)
                self.row_off.append(off_rows)
                continue
            rk, starts, gid_sorted = comp
            starts = np.asarray(starts, np.int64)
            self.rks.append(np.asarray(rk, np.uint32))
            self.row_off.append(off_rows)
            starts_all.append(starts[1:] + off_post)
            gids_all.append(np.asarray(gid_sorted, np.int32))
            off_rows += starts.size - 1
            off_post += int(starts[-1])
        starts_g = np.concatenate(starts_all)
        gids_g = (np.concatenate(gids_all) if gids_all
                  else np.zeros(0, np.int32))
        self.sub = SubrowTable(starts_g, gids_g)

    def group_stats(self, per_comp_queries: list,
                    st_pctl: float, ed_pctl: float):
        """per_comp_queries: per-component (sorted qids, aligned qab)
        tuples (or None).  Returns (count, sum, lastsum, lastn, median,
        max) int64 arrays of length nref — the exact
        postings_group_stats contract."""
        import jax.numpy as jnp
        rows_l, ab_l = [], []
        for c, q in enumerate(per_comp_queries):
            if q is None or self.rks[c] is None:
                continue
            qids_s, qab_s = q
            rk = self.rks[c]
            if qids_s.size == 0 or rk.size == 0:
                continue
            # host membership: tiny vs the postings sweep
            pos = np.searchsorted(rk, qids_s)
            pos_c = np.minimum(pos, rk.size - 1)
            member = rk[pos_c] == qids_s
            rows_l.append(pos_c[member] + self.row_off[c])
            ab_l.append(np.asarray(qab_s)[member].astype(np.uint32))
        rows = (np.concatenate(rows_l) if rows_l
                else np.zeros(0, np.int64))
        abm = (np.concatenate(ab_l) if ab_l
               else np.zeros(0, np.uint32))
        subs, absub = self.sub.expand_rows(rows, abm)
        nm = int(subs.size)
        bucket = _bucket(max(nm, 1))
        rpad = np.zeros(bucket, np.int32)
        rpad[:nm] = subs
        apad = np.zeros(bucket, np.uint32)
        apad[:nm] = absub
        counts, slo, shi, med, mx, base, clo, chi = _stats_pass1(
            self.sub._sst_d, self.sub._sen_d, self.sub._gids_d,
            jnp.asarray(rpad), jnp.asarray(apad),
            jnp.asarray(np.int32(nm)),
            nref=self.nref, npost=int(self.sub._gids_d.shape[0]))
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
