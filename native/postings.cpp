// Posting-list reduction kernels for dist / composite profiling.
//
// The TPU-side membership search returns, per query k-mer, the matched
// row of the inverted MarkerDB index (formats/mco.py CSR layout:
// gids[starts[r]:starts[r+1]] are the genomes containing k-mer r).
// What follows — walking matched rows' posting lists and accumulating
// per-genome counts (reference command_dist.c:1044-1049) or expanding
// (genome, abundance) pairs (command_composite.c:524-560) — is
// host-side, memory-bandwidth-bound work.  NumPy needs three
// O(postings) passes and as many temporaries; these do one.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// acc[gids[p]] += 1 for every posting p of every row in rows.
// Rows may repeat (one entry per query k-mer *occurrence*, matching the
// reference's per-occurrence semantics).  OpenMP array reduction when
// the posting volume is worth the per-thread accumulators.
void postings_count_u32(const int64_t* rows, int64_t nr,
                        const int64_t* starts, const uint32_t* gids,
                        uint32_t* acc, int64_t nref) {
    int64_t total = 0;
    for (int64_t i = 0; i < nr; i++)
        total += starts[rows[i] + 1] - starts[rows[i]];
    if (total > (int64_t)4 << 20 && nref <= (int64_t)16 << 20) {
#pragma omp parallel for schedule(dynamic, 1024) \
    reduction(+ : acc[:nref])
        for (int64_t i = 0; i < nr; i++) {
            int64_t r = rows[i];
            for (int64_t p = starts[r]; p < starts[r + 1]; p++)
                acc[gids[p]]++;
        }
    } else {
        for (int64_t i = 0; i < nr; i++) {
            int64_t r = rows[i];
            for (int64_t p = starts[r]; p < starts[r + 1]; p++)
                acc[gids[p]]++;
        }
    }
}

// Like postings_count_u32 but with explicit [st, en) ranges — the
// dense-mco random-access path, where row extents come straight from
// the mmap'd cumulative index (command_dist.c:1042-1049 access shape).
void postings_count_ranges(const int64_t* st, const int64_t* en,
                           int64_t n, const uint32_t* gids,
                           uint32_t* acc, int64_t nref) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += en[i] - st[i];
    if (total > (int64_t)4 << 20 && nref <= (int64_t)16 << 20) {
#pragma omp parallel for schedule(dynamic, 1024) \
    reduction(+ : acc[:nref])
        for (int64_t i = 0; i < n; i++)
            for (int64_t p = st[i]; p < en[i]; p++)
                acc[gids[p]]++;
    } else {
        for (int64_t i = 0; i < n; i++)
            for (int64_t p = st[i]; p < en[i]; p++)
                acc[gids[p]]++;
    }
}

// Expand matched rows into flat (genome, query-abundance) posting
// arrays: out_gid gets the posting genomes row by row, out_ab repeats
// each row's query abundance across its postings.  Caller sizes the
// outputs to sum(row lengths).
void postings_expand_i32(const int64_t* rows, int64_t nr,
                         const int64_t* starts, const int32_t* gids,
                         const uint16_t* ab, int32_t* out_gid,
                         uint16_t* out_ab) {
    // per-row output offsets (serial prefix sum, then parallel fill)
    int64_t* off = new int64_t[nr + 1];
    off[0] = 0;
    for (int64_t i = 0; i < nr; i++)
        off[i + 1] = off[i] + (starts[rows[i] + 1] - starts[rows[i]]);
#pragma omp parallel for schedule(dynamic, 256)
    for (int64_t i = 0; i < nr; i++) {
        int64_t r = rows[i];
        int64_t len = starts[r + 1] - starts[r];
        memcpy(out_gid + off[i], gids + starts[r],
               (size_t)len * sizeof(int32_t));
        if (ab && out_ab) {
            uint16_t a = ab[i];
            for (int64_t j = 0; j < len; j++) out_ab[off[i] + j] = a;
        }
    }
    delete[] off;
}

// Per-genome profile statistics over unordered matched (genome,
// abundance) postings — the reference's per-genome sorted-array walk
// (command_composite.c:596-624) fused into one grouped pass: counting
// sort by genome, per-genome value sort, then the stats on the
// reference's 1-based layout s1[0]=count, s1[1..n]=sorted values
// (including its quirks: median = s1[n/2] which is the COUNT when
// n == 1, and the [n*st, n*ed] percentile window starting at s1[0]
// for tiny n).  Float divisions stay with the Python caller so f32
// rounding matches the reference bit-for-bit.
void postings_group_stats(
    const int32_t* gids, const uint16_t* ab, int64_t n, int64_t nref,
    double st_pctl, double ed_pctl, int64_t* count, int64_t* sum,
    int64_t* lastsum, int64_t* lastn, int64_t* median, int64_t* maxv) {
    memset(count, 0, (size_t)nref * sizeof(int64_t));
    for (int64_t i = 0; i < n; i++) count[gids[i]]++;
    int64_t* off = new int64_t[nref + 1];
    off[0] = 0;
    for (int64_t g = 0; g < nref; g++) off[g + 1] = off[g] + count[g];
    uint16_t* grouped = new uint16_t[n];
    int64_t* cur = new int64_t[nref];
    memcpy(cur, off, (size_t)nref * sizeof(int64_t));
    for (int64_t i = 0; i < n; i++) grouped[cur[gids[i]]++] = ab[i];
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t g = 0; g < nref; g++) {
        int64_t cnt = count[g];
        sum[g] = lastsum[g] = lastn[g] = median[g] = maxv[g] = 0;
        if (!cnt) {
            // Match the reference's quirk loop at cnt==0: the percentile
            // loop still runs its i==0 iteration and accumulates s1[0]
            // (= cnt = 0) with lastn=1, so avg9899 prints 0.000000, not
            // nan (command_composite.c:603-613 semantics; keeps native
            // and Python-fallback outputs identical at --min-km-s 0).
            lastn[g] = 1;
            continue;
        }
        uint16_t* v = grouped + off[g];
        std::sort(v, v + cnt);
        int64_t s = 0;
        for (int64_t i = 0; i < cnt; i++) s += v[i];
        sum[g] = s;
        // s1[i]: s1[0] = cnt, s1[i>=1] = v[i-1]
        int64_t m = cnt / 2;
        median[g] = m == 0 ? cnt : v[m - 1];
        maxv[g] = v[cnt - 1];
        int64_t ls = 0, ln = 0;
        for (int64_t i = (int64_t)(cnt * st_pctl);
             (double)i <= cnt * ed_pctl; i++) {
            ls += i == 0 ? cnt : v[i - 1];
            ln++;
        }
        lastsum[g] = ls;
        lastn[g] = ln;
    }
    delete[] cur;
    delete[] grouped;
    delete[] off;
}

}  // extern "C" (reopened below)

// Shared radix core: stable LSD sort of u32 keys (optionally carrying
// an i32 value per key) with an even number of digit passes — 16-bit-
// balanced digits for >16-bit key ranges, one digit + a stable
// copy-back pass otherwise (measured sweep in the git history).  A
// SINGLE parallel region per pass computes histogram, prefix, and
// scatter with one consistent team size (OMP_DYNAMIC / THREAD_LIMIT
// may deliver fewer threads than requested; chunk boundaries must
// come from the actual team, or chunks would be silently dropped).
template <bool HasVals>
static void radix_core_u32(uint32_t* keys, int32_t* vals, int64_t n,
                           uint32_t* kscratch, int32_t* vscratch) {
    if (n <= 1) return;
    int nt_max = 1;
#ifdef _OPENMP
    nt_max = omp_get_max_threads();
#endif
    if (nt_max > 64) nt_max = 64;
    if (nt_max < 1) nt_max = 1;
    uint32_t maxk = 0;
#pragma omp parallel for reduction(max : maxk)
    for (int64_t i = 0; i < n; i++)
        if (keys[i] > maxk) maxk = keys[i];
    int nbits = 1;
    while (nbits < 32 && (maxk >> nbits)) nbits++;
    const int d0 = nbits > 16 ? (nbits + 1) / 2 : nbits;
    const int digit_bits[2] = {d0, nbits - d0};
    const int shifts[2] = {0, d0};
    const size_t nb_max =
        (size_t)1 << (d0 > nbits - d0 ? d0 : nbits - d0);
    std::vector<int64_t> hist((size_t)nt_max * nb_max);
    uint32_t* ksrc = keys;
    int32_t* vsrc = vals;
    uint32_t* kdst = kscratch;
    int32_t* vdst = vscratch;
    for (int pass = 0; pass < 2; pass++) {
        const int shift = shifts[pass];
        const uint32_t mask =
            (uint32_t)(((uint64_t)1 << digit_bits[pass]) - 1);
        const size_t nb = (size_t)mask + 1;
#pragma omp parallel num_threads(nt_max)
        {
#ifdef _OPENMP
            const int T = omp_get_num_threads();
            const int tid = omp_get_thread_num();
#else
            const int T = 1;
            const int tid = 0;
#endif
            const int64_t lo = n * tid / T, hi = n * (tid + 1) / T;
            int64_t* h = hist.data() + (size_t)tid * nb;
            std::memset(h, 0, nb * sizeof(int64_t));
            for (int64_t i = lo; i < hi; i++)
                h[(ksrc[i] >> shift) & mask]++;
#pragma omp barrier
#pragma omp single
            {
                // exclusive prefix over (bucket, thread): thread t's
                // bucket b region starts after all smaller buckets and
                // earlier threads
                int64_t sum = 0;
                for (size_t b = 0; b < nb; b++)
                    for (int t = 0; t < T; t++) {
                        int64_t c = hist[(size_t)t * nb + b];
                        hist[(size_t)t * nb + b] = sum;
                        sum += c;
                    }
            }  // implicit barrier
            for (int64_t i = lo; i < hi; i++) {
                int64_t d = h[(ksrc[i] >> shift) & mask]++;
                kdst[d] = ksrc[i];
                if (HasVals) vdst[d] = vsrc[i];
            }
        }
        std::swap(ksrc, kdst);
        if (HasVals) std::swap(vsrc, vdst);
    }
    // 2 passes = even count: data is back in keys/vals already
    (void)vsrc;
}

// Fused inverted-index build: equivalent to
//   keys = copy(src_keys); vals = repeat(arange(nref), diff(gindex));
//   kv_radix_sort(keys, vals)
// but the copy and the repeat never materialise — pass 1 histograms
// and scatters straight from the (typically mmap'd) source, deriving
// each position's genome row by walking gindex, so the mmap faults in
// across all threads and two 236 MB first-touch allocations (the
// dominant cold-staging cost on this host: ~0.1 GB/s/thread fault
// rate) disappear entirely.  Same stability/digit scheme as
// radix_core_u32.
static void invert_core_u32(const uint32_t* src, const uint64_t* gindex,
                            int32_t nref, int64_t n, uint32_t* keys,
                            int32_t* vals, uint32_t* kscratch,
                            int32_t* vscratch) {
    if (n <= 0) return;
    int nt_max = 1;
#ifdef _OPENMP
    nt_max = omp_get_max_threads();
#endif
    if (nt_max > 64) nt_max = 64;
    if (nt_max < 1) nt_max = 1;
    uint32_t maxk = 0;
#pragma omp parallel for reduction(max : maxk)
    for (int64_t i = 0; i < n; i++)
        if (src[i] > maxk) maxk = src[i];
    int nbits = 1;
    while (nbits < 32 && (maxk >> nbits)) nbits++;
    const int d0 = nbits > 16 ? (nbits + 1) / 2 : nbits;
    const int digit_bits[2] = {d0, nbits - d0};
    const int shifts[2] = {0, d0};
    const size_t nb_max =
        (size_t)1 << (d0 > nbits - d0 ? d0 : nbits - d0);
    std::vector<int64_t> hist((size_t)nt_max * nb_max);
    for (int pass = 0; pass < 2; pass++) {
        const uint32_t* ksrc = pass == 0 ? src : kscratch;
        const int32_t* vsrc = pass == 0 ? nullptr : vscratch;
        uint32_t* kdst = pass == 0 ? kscratch : keys;
        int32_t* vdst = pass == 0 ? vscratch : vals;
        const int shift = shifts[pass];
        const uint32_t mask =
            (uint32_t)(((uint64_t)1 << digit_bits[pass]) - 1);
        const size_t nb = (size_t)mask + 1;
#pragma omp parallel num_threads(nt_max)
        {
#ifdef _OPENMP
            const int T = omp_get_num_threads();
            const int tid = omp_get_thread_num();
#else
            const int T = 1;
            const int tid = 0;
#endif
            const int64_t lo = n * tid / T, hi = n * (tid + 1) / T;
            int64_t* h = hist.data() + (size_t)tid * nb;
            std::memset(h, 0, nb * sizeof(int64_t));
            for (int64_t i = lo; i < hi; i++)
                h[(ksrc[i] >> shift) & mask]++;
#pragma omp barrier
#pragma omp single
            {
                int64_t sum = 0;
                for (size_t b = 0; b < nb; b++)
                    for (int t = 0; t < T; t++) {
                        int64_t c = hist[(size_t)t * nb + b];
                        hist[(size_t)t * nb + b] = sum;
                        sum += c;
                    }
            }  // implicit barrier
            if (pass == 0) {
                // genome row of position lo: last g with gindex[g]<=lo
                int32_t g = (int32_t)(std::upper_bound(
                    gindex, gindex + nref + 1, (uint64_t)lo)
                    - gindex) - 1;
                if (g < 0) g = 0;
                for (int64_t i = lo; i < hi; i++) {
                    while (g + 1 <= nref - 1 &&
                           (uint64_t)i >= gindex[g + 1]) g++;
                    int64_t d = h[(ksrc[i] >> shift) & mask]++;
                    kdst[d] = ksrc[i];
                    vdst[d] = g;
                }
            } else {
                for (int64_t i = lo; i < hi; i++) {
                    int64_t d = h[(ksrc[i] >> shift) & mask]++;
                    kdst[d] = ksrc[i];
                    vdst[d] = vsrc[i];
                }
            }
        }
    }
}

extern "C" {

// Stable LSD radix sort of (u32 key, i32 val) pairs by key, in place;
// scratch is caller-provided.  Builds the MarkerDB / stage-II inverted
// indexes (sort 59M postings by k-mer in ~2.3 s on 2 cores, ~3x
// numpy's argsort + gather) and keeps genome ids ascending within a
// k-mer (stability).
void kv_radix_sort_u32(uint32_t* keys, int32_t* vals, int64_t n,
                       uint32_t* kscratch, int32_t* vscratch) {
    radix_core_u32<true>(keys, vals, n, kscratch, vscratch);
}

// Key-only variant: host pan-build unions sort + linear-unique with
// this at ~3x np.unique (40M u32 ids: 0.36 s on 2 cores).
void k_radix_sort_u32(uint32_t* keys, int64_t n, uint32_t* kscratch) {
    radix_core_u32<false>(keys, nullptr, n, kscratch, nullptr);
}

// Fused inverted-index build (see invert_core_u32 above): sorted keys
// land in `keys`, their genome rows in `vals`, straight from the
// mmap'd combco stream + genome index — no key copy, no materialised
// np.repeat row array.
void invert_postings_u32(const uint32_t* src, const uint64_t* gindex,
                         int32_t nref, int64_t n, uint32_t* keys,
                         int32_t* vals, uint32_t* kscratch,
                         int32_t* vscratch) {
    invert_core_u32(src, gindex, nref, n, keys, vals, kscratch,
                    vscratch);
}

// First-occurrence indices of an ASCENDING-sorted u32 array (the
// linear unique of the inverted-index builders).  Stateless two-call
// protocol: with out == nullptr returns the distinct count; with out
// (int64[count]) fills the indices (re-running the cheap per-chunk
// boundary count + exclusive scan internally).  Parallel sequential
// sweeps — faster than numpy's not_equal + flatnonzero, which
// materialises an n-byte mask and scans it serially.
int64_t sorted_first_indices_u32(const uint32_t* keys, int64_t n,
                                 int64_t* out) {
    if (n <= 0) return 0;
    int nt = 1;
#ifdef _OPENMP
    nt = omp_get_max_threads();
#endif
    if (nt > 64) nt = 64;
    int64_t chunk = (n + nt - 1) / nt;
    if (chunk < 1) chunk = 1;
    int64_t counts[64] = {0};
    #pragma omp parallel for num_threads(nt) schedule(static, 1)
    for (int t = 0; t < nt; t++) {
        int64_t lo = t * chunk, hi = lo + chunk;
        if (lo > n) lo = n;
        if (hi > n) hi = n;
        int64_t c = 0;
        for (int64_t i = lo; i < hi; i++)
            c += (i == 0 || keys[i] != keys[i - 1]);
        counts[t] = c;
    }
    int64_t total = 0;
    for (int t = 0; t < nt; t++) {     // exclusive scan
        int64_t c = counts[t];
        counts[t] = total;
        total += c;
    }
    if (!out) return total;
    #pragma omp parallel for num_threads(nt) schedule(static, 1)
    for (int t = 0; t < nt; t++) {
        int64_t lo = t * chunk, hi = lo + chunk;
        if (lo > n) lo = n;
        if (hi > n) hi = n;
        int64_t d = counts[t];
        for (int64_t i = lo; i < hi; i++)
            if (i == 0 || keys[i] != keys[i - 1]) out[d++] = i;
    }
    return total;
}

// sorted_first_indices_u32 + the distinct-key gather fused into the
// same parallel fill pass: out_keys[j] = keys[out_idx[j]].  Saves a
// separate fancy-gather over a fresh output buffer (first-touch page
// faults dominate that gather on this host).  Same two-call protocol
// (out_idx == nullptr counts only).
int64_t sorted_unique_pack_u32(const uint32_t* keys, int64_t n,
                               int64_t* out_idx, uint32_t* out_keys) {
    if (n <= 0) return 0;
    if (!out_idx) return sorted_first_indices_u32(keys, n, nullptr);
    int nt = 1;
#ifdef _OPENMP
    nt = omp_get_max_threads();
#endif
    if (nt > 64) nt = 64;
    int64_t chunk = (n + nt - 1) / nt;
    if (chunk < 1) chunk = 1;
    int64_t counts[64] = {0};
    #pragma omp parallel for num_threads(nt) schedule(static, 1)
    for (int t = 0; t < nt; t++) {
        int64_t lo = t * chunk, hi = lo + chunk;
        if (lo > n) lo = n;
        if (hi > n) hi = n;
        int64_t c = 0;
        for (int64_t i = lo; i < hi; i++)
            c += (i == 0 || keys[i] != keys[i - 1]);
        counts[t] = c;
    }
    int64_t total = 0;
    for (int t = 0; t < nt; t++) {
        int64_t c = counts[t];
        counts[t] = total;
        total += c;
    }
    #pragma omp parallel for num_threads(nt) schedule(static, 1)
    for (int t = 0; t < nt; t++) {
        int64_t lo = t * chunk, hi = lo + chunk;
        if (lo > n) lo = n;
        if (hi > n) hi = n;
        int64_t d = counts[t];
        for (int64_t i = lo; i < hi; i++)
            if (i == 0 || keys[i] != keys[i - 1]) {
                out_idx[d] = i;
                out_keys[d] = keys[i];
                d++;
            }
    }
    return total;
}

}  // extern "C"
