// sketch_core — the KSSD window-decomposition inner loop, shared by the
// standalone CPU sketcher (sketch_cpu.cpp) and the fused fastq→drtuple
// engine (fastseq.cpp).  Bit-exact model of reference
// iseq2comem.c:240-311 (see metakssd_tpu/ops/golden.py), engineered for
// CPU caches: a 16^subk-bit accept bitmask probed per window with an
// L1-resident folded pre-filter, then a binary search over the tiny
// sorted accept table for survivors (~1/4096 windows).
#pragma once

#include <cstdint>
#include <vector>

namespace kssd {

struct SketchCfg {
    int k, subk, drlevel;
    const uint32_t* accept_tups;   // sorted, n_accept entries
    const uint32_t* pfilters;      // aligned with accept_tups
    int64_t n_accept;
    const uint32_t* bitmask;       // 16^subk bits
    const uint32_t* premask;       // PRE_BITS-bit L1-resident pre-filter
};

// First-level accept pre-filter: dim folded into a 1 Mbit (128 KiB)
// L2-resident bitmask.  Built from the accept table with zero false
// negatives; false-positive windows (~n_accept/PRE_BITS = 0.4% at the
// default 4096 accepts) fall through to the full 16^subk-bit mask.
// (Sizing measured in round 2: 349/444/519 Mprobe/s at 8/32/128 KiB.)
constexpr uint32_t PRE_BITS = 1u << 20;

inline std::vector<uint32_t> build_premask(const uint32_t* accept_tups,
                                           int64_t n_accept) {
    std::vector<uint32_t> premask(PRE_BITS / 32, 0);
    for (int64_t t = 0; t < n_accept; t++) {
        uint32_t fold = accept_tups[t] & (PRE_BITS - 1);
        premask[fold >> 5] |= 1u << (fold & 31);
    }
    return premask;
}

// lower_bound over the accept table (branch-free-ish; n_accept is small
// and cache-hot).
inline int64_t lower_bound_u32(const uint32_t* a, int64_t n, uint32_t v) {
    int64_t lo = 0;
    while (n > 1) {
        int64_t half = n / 2;
        lo += (a[lo + half - 1] < v) ? half : 0;
        n -= half;
    }
    return lo;
}

// Sketch one chunk [start, end) of a code stream; windows starting in
// [start, end) are emitted (the chunk may read up to TL-1 codes past
// end).  Appends accepted drtuples to out.  Two-pass blocks: pass 1
// runs the (serial-dependency) rolling window recurrence and buffers
// canonical windows; pass 2 probes the accept masks over the buffer —
// independent loads the core can keep in flight, instead of one
// dependent L2 miss per window.
inline void sketch_chunk(const uint8_t* codes, int64_t size, int64_t start,
                         int64_t end, const SketchCfg& c,
                         std::vector<uint64_t>& out) {
    const int TL = 2 * c.k;
    const int outctx = c.k - c.subk;
    const uint64_t tl_mask =
        (TL == 32) ? ~0ULL : ((1ULL << (2 * TL)) - 1);
    const uint32_t dim_mask = (1u << (4 * c.subk)) - 1;
    const uint64_t outer_mask = (1ULL << (2 * outctx)) - 1;
    const uint64_t undomask =
        ((1ULL << (2 * outctx)) - 1) << (2 * outctx + 4 * c.subk);
    const int rc_shift = 2 * (TL - 1);

    uint64_t fwd = 0, rc = 0;
    int vlen = 0;
    int64_t stop = end + TL - 1 < size ? end + TL - 1 : size;

    constexpr int B = 256;
    uint64_t buf[B];
    int nb = 0;

    auto flush = [&]() {
        for (int j = 0; j < nb; j++) {
            uint64_t uni = buf[j];
            uint32_t dim = (uint32_t)(uni >> (2 * outctx)) & dim_mask;
            uint32_t fold = dim & (PRE_BITS - 1);
            if (!((c.premask[fold >> 5] >> (fold & 31)) & 1)) continue;
            if (!((c.bitmask[dim >> 5] >> (dim & 31)) & 1)) continue;
            int64_t pos = lower_bound_u32(c.accept_tups, c.n_accept,
                                          dim);
            uint64_t dr =
                (((uni & undomask)
                  + ((uni & outer_mask) << (4 * c.k - 4 * outctx)))
                 >> (4 * c.drlevel))
                + c.pfilters[pos];
            out.push_back(dr);
        }
        nb = 0;
    };

    for (int64_t i = start; i < stop; i++) {
        uint8_t b = codes[i];
        if (b > 3) { vlen = 0; continue; }
        fwd = ((fwd << 2) | b) & tl_mask;
        rc = (rc >> 2) | ((uint64_t)(3 - b) << rc_shift);
        if (++vlen < TL) continue;
        if (i - (TL - 1) >= end) break;   // window belongs to next chunk
        buf[nb++] = fwd < rc ? fwd : rc;
        if (nb == B) flush();
    }
    flush();
}

}  // namespace kssd
