// sketch_core — the KSSD window-decomposition inner loop, shared by the
// standalone CPU sketcher (sketch_cpu.cpp) and the fused fastq→drtuple
// engine (fastseq.cpp).  Bit-exact model of reference
// iseq2comem.c:240-311 (see metakssd_tpu/ops/golden.py), engineered for
// CPU caches: a 16^subk-bit accept bitmask probed per window with an
// L1-resident folded pre-filter, then a binary search over the tiny
// sorted accept table for survivors (~1/4096 windows).
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX2__)
#define KSSD_SIMD_SKETCH 1
#include <immintrin.h>
#endif

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

// -------------------------------------------------------------------
// AVX-512 window scan.
//
// Key identities (2-bit code c, complement = c^3 = ~c per 2-bit group):
//   * little-endian packed stream PLE (base i at bits 2i):
//       44-bit extract at bit 2i  =  sum_t b[i+t] << 2t
//       and ~PLE extracted there  =  sum_t (3-b[i+t]) << 2t  =  rc(i)
//   * big-endian packed stream PBE (base i at bits 2(N-1-i), built by
//     byte-reversing PLE and reversing 2-bit groups within each byte):
//       2TL-bit extract at bit 2(N-TL-i)  =  fwd(i)
// So both window orientations are contiguous unaligned u64 loads +
// per-lane shifts (vpsrlvq) — no per-window reversal.  Validity is a
// run-of-TL bitmask; survivors of a vectorized premask gather-probe are
// compress-stored for the scalar drtuple emit (~0.4% of windows).
// Measured (this host, 1 thread, L3K11): 340 -> ~1000 Mwin/s vs the
// rolling scalar loop.
// -------------------------------------------------------------------

struct PackScratch {
    std::vector<uint64_t> ple, pbe, v, w;
};

#ifdef KSSD_SIMD_SKETCH

// Eligibility: the 8-lane extraction needs max_shift + 2*TL <= 64 where
// max_shift = ((2*(npad-TL) mod 8) - 14 mod 8) + 14 <= 21.  Checked at
// runtime per (TL, npad) by sketch_span below.
inline bool simd_sketch_supported() { return true; }

inline void pack_streams(const uint8_t* codes, int64_t n, int TL,
                         PackScratch& P) {
    int64_t np = (n + 31) / 32 * 32;
    size_t nw = (size_t)np / 32;
    if (P.ple.size() < nw + 2) {
        P.ple.resize(nw + 2);
        P.pbe.resize(nw + 4);            // +1 word front guard
        P.v.resize((size_t)np / 64 + 2);
        P.w.resize((size_t)np / 64 + 2);
    }
    uint64_t* ple = P.ple.data();
    uint64_t* v = P.v.data();
    // zero everything the vector stores won't fully overwrite (blocks
    // are ~48 KiB so these memsets are trivially cheap)
    memset(ple, 0, (nw + 2) * sizeof(uint64_t));
    memset(v, 0, ((size_t)np / 64 + 2) * sizeof(uint64_t));
    {
        uint8_t* pb = (uint8_t*)ple;
        uint32_t* vb = (uint32_t*)v;
        const __m256i m3 = _mm256_set1_epi8(3);
        const __m256i w1 = _mm256_set1_epi16(0x0401);    // b0 + 4*b1
        const __m256i w2 = _mm256_set1_epi32(0x00100001);  // p0 + 16*p1
        const __m256i shufg = _mm256_setr_epi8(
            0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
            0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1);
        int64_t i = 0;
        for (; i + 32 <= n; i += 32) {
            __m256i x = _mm256_loadu_si256((const __m256i*)(codes + i));
            uint32_t ok = (uint32_t)_mm256_movemask_epi8(
                _mm256_cmpeq_epi8(
                    _mm256_and_si256(x, _mm256_set1_epi8((char)0xFC)),
                    _mm256_setzero_si256()));
            vb[i >> 5] = ok;
            __m256i p16 = _mm256_maddubs_epi16(_mm256_and_si256(x, m3), w1);
            __m256i p32 = _mm256_madd_epi16(p16, w2);
            __m256i g = _mm256_shuffle_epi8(p32, shufg);
            uint32_t lo = (uint32_t)_mm_cvtsi128_si32(
                _mm256_castsi256_si128(g));
            uint32_t hi = (uint32_t)_mm_cvtsi128_si32(
                _mm256_extracti128_si256(g, 1));
            *(uint64_t*)(pb + (i >> 2)) = ((uint64_t)hi << 32) | lo;
        }
        for (; i < n; i++) {              // scalar tail over zeroed words
            uint8_t c = codes[i];
            if (c < 4) {
                ple[i >> 5] |= (uint64_t)c << (2 * (i & 31));
                v[i >> 6] |= 1ULL << (i & 63);
            }
        }
    }
    // PBE = byte-reversed PLE with 2-bit groups reversed per byte
    {
        const uint8_t* leb = (const uint8_t*)ple;
        uint8_t* beb = (uint8_t*)P.pbe.data() + 8;
        int64_t nb = np / 4;
        const __m256i nibLUT = _mm256_setr_epi8(
            0x0, 0x4, 0x8, 0xC, 0x1, 0x5, 0x9, 0xD,
            0x2, 0x6, 0xA, 0xE, 0x3, 0x7, 0xB, 0xF,
            0x0, 0x4, 0x8, 0xC, 0x1, 0x5, 0x9, 0xD,
            0x2, 0x6, 0xA, 0xE, 0x3, 0x7, 0xB, 0xF);
        const __m256i m0f = _mm256_set1_epi8(0x0F);
        const __m256i revb = _mm256_setr_epi8(
            15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0,
            15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
        int64_t r = 0;
        for (; r + 32 <= nb; r += 32) {
            __m256i x = _mm256_loadu_si256((const __m256i*)(leb + nb - r - 32));
            x = _mm256_shuffle_epi8(x, revb);
            x = _mm256_permute2x128_si256(x, x, 1);
            __m256i lo = _mm256_and_si256(x, m0f);
            __m256i hi = _mm256_and_si256(_mm256_srli_epi16(x, 4), m0f);
            _mm256_storeu_si256(
                (__m256i*)(beb + r),
                _mm256_or_si256(
                    _mm256_slli_epi16(_mm256_shuffle_epi8(nibLUT, lo), 4),
                    _mm256_shuffle_epi8(nibLUT, hi)));
        }
        for (; r < nb; r++) {
            uint8_t b = leb[nb - 1 - r];
            beb[r] = (uint8_t)(((b & 3) << 6) | (((b >> 2) & 3) << 4) |
                               (((b >> 4) & 3) << 2) | ((b >> 6) & 3));
        }
    }
    // W = run-of-TL of V (bit i set iff V[i..i+TL-1] all set)
    {
        uint64_t* w = P.w.data();
        size_t nvw = (size_t)np / 64 + 1;
        for (size_t wd = 0; wd < nvw; wd++) {
            unsigned __int128 x =
                ((unsigned __int128)P.v[wd + 1] << 64) | P.v[wd];
            unsigned __int128 r2 = x & (x >> 1), r4 = r2 & (r2 >> 2),
                              r8 = r4 & (r4 >> 4), r16 = r8 & (r8 >> 8),
                              r32 = r16 & (r16 >> 16);
            unsigned __int128 rp[6] = {x, r2, r4, r8, r16, r32};
            const int pv[6] = {1, 2, 4, 8, 16, 32};
            unsigned __int128 res = ~(unsigned __int128)0;
            int off = 0, rem = TL;
            for (int kk = 5; kk >= 0; kk--)
                while (rem >= pv[kk]) {
                    res &= rp[kk] >> off;
                    off += pv[kk];
                    rem -= pv[kk];
                }
            w[wd] = (uint64_t)res;
        }
    }
}

// SIMD equivalent of sketch_chunk over a self-contained span: windows
// [start, end) of codes (may read up to TL-1 codes past end).  Returns
// false if the configuration is outside the 8-lane extraction envelope
// (caller falls back to sketch_chunk).
inline bool sketch_chunk_simd(const uint8_t* codes, int64_t size,
                              int64_t start, int64_t end,
                              const SketchCfg& c, PackScratch& P,
                              std::vector<uint64_t>& out) {
    const int TL = 2 * c.k;
    int64_t n = (end + TL - 1 < size ? end + TL - 1 : size) - start;
    if (n < TL) return true;
    int64_t np = (n + 31) / 32 * 32;
    // fwd lane-0 shift base: m0 = (2*(np-TL) - 14) mod 8; envelope:
    // m0 + 14 + 2*TL <= 64   (TL=22 lands exactly on 64)
    const int m0 = (int)(((2 * (np - TL) - 14) % 8 + 8) % 8);
    if (m0 + 14 + 2 * TL > 64) return false;
    pack_streams(codes + start, n, TL, P);
    const int64_t nwin = n - TL + 1;
    const uint8_t* le = (const uint8_t*)P.ple.data();
    const uint8_t* be = (const uint8_t*)P.pbe.data() + 8;
    const uint64_t* w = P.w.data();
    const int outctx = c.k - c.subk;
    const uint32_t dim_mask = (1u << (4 * c.subk)) - 1;
    const uint64_t maskTL = (1ULL << (2 * TL)) - 1;

    constexpr int B = 512;
    uint64_t buf[B + 8];
    int nb = 0;
    auto flush = [&]() {
        const uint64_t outer_mask = (1ULL << (2 * outctx)) - 1;
        const uint64_t undomask = outer_mask << (2 * outctx + 4 * c.subk);
        for (int j = 0; j < nb; j++) {
            uint64_t uni = buf[j];
            uint32_t dim = (uint32_t)(uni >> (2 * outctx)) & dim_mask;
            if (!((c.bitmask[dim >> 5] >> (dim & 31)) & 1)) continue;
            int64_t pos = lower_bound_u32(c.accept_tups, c.n_accept, dim);
            uint64_t dr =
                (((uni & undomask)
                  + ((uni & outer_mask) << (4 * c.k - 4 * outctx)))
                 >> (4 * c.drlevel))
                + c.pfilters[pos];
            out.push_back(dr);
        }
        nb = 0;
    };

    const __m512i shf = _mm512_set_epi64(
        m0, m0 + 2, m0 + 4, m0 + 6, m0 + 8, m0 + 10, m0 + 12, m0 + 14);
    const __m512i shr = _mm512_set_epi64(14, 12, 10, 8, 6, 4, 2, 0);
    const __m512i vmaskTL = _mm512_set1_epi64((long long)maskTL);
    const __m512i vdimmask = _mm512_set1_epi64((long long)dim_mask);
    const __m512i vfoldmask = _mm512_set1_epi64((long long)(PRE_BITS - 1));
    const __m512i v31 = _mm512_set1_epi64(31);
    const __m512i vone = _mm512_set1_epi64(1);
    const __m512i vneg1 = _mm512_set1_epi64(-1);
    int64_t i = 0;
    for (; i + 8 <= nwin; i += 8) {
        uint8_t wb8 = (uint8_t)(
            (*(const uint64_t*)((const uint8_t*)w + (i >> 3))) >> (i & 7));
        if (!wb8) continue;
        int64_t off_base = 2 * (np - TL - i);
        const uint64_t fw = *(const uint64_t*)(be + ((off_base - m0 - 14) >> 3));
        const uint64_t rw = *(const uint64_t*)(le + (i >> 2));
        __m512i fwd = _mm512_and_si512(
            _mm512_srlv_epi64(_mm512_set1_epi64((long long)fw), shf),
            vmaskTL);
        __m512i rc = _mm512_and_si512(
            _mm512_srlv_epi64(
                _mm512_xor_si512(_mm512_set1_epi64((long long)rw), vneg1),
                shr),
            vmaskTL);
        __m512i can = _mm512_min_epu64(fwd, rc);
        __m512i dim = _mm512_and_si512(_mm512_srli_epi64(can, 2 * outctx),
                                       vdimmask);
        __m512i fold = _mm512_and_si512(dim, vfoldmask);
        __m256i words = _mm512_i64gather_epi32(
            _mm512_srli_epi64(fold, 5), (const int*)c.premask, 4);
        __mmask8 hit = _mm512_test_epi64_mask(
            _mm512_srlv_epi64(_mm512_cvtepu32_epi64(words),
                              _mm512_and_si512(fold, v31)),
            vone);
        __mmask8 keep = (__mmask8)(wb8 & (uint8_t)hit);
        if (!keep) continue;
        _mm512_mask_compressstoreu_epi64(buf + nb, keep, can);
        nb += __builtin_popcount(keep);
        if (nb >= B) flush();
    }
    for (; i < nwin; i++) {              // scalar tail via bit extraction
        if (!((w[i >> 6] >> (i & 63)) & 1)) continue;
        int64_t ob = 2 * (np - TL - i);
        uint64_t f = ((*(const uint64_t*)(be + (ob >> 3))) >> (ob & 7))
                     & maskTL;
        uint64_t r = ((~(*(const uint64_t*)(le + (i >> 2)))) >> ((2 * i) & 7))
                     & maskTL;
        uint64_t uni = f < r ? f : r;
        uint32_t dim = (uint32_t)(uni >> (2 * outctx)) & dim_mask;
        uint32_t fold2 = dim & (PRE_BITS - 1);
        if (!((c.premask[fold2 >> 5] >> (fold2 & 31)) & 1)) continue;
        buf[nb++] = uni;
        if (nb >= B) flush();
    }
    flush();
    return true;
}

#else  // !KSSD_SIMD_SKETCH

inline bool simd_sketch_supported() { return false; }
inline bool sketch_chunk_simd(const uint8_t*, int64_t, int64_t, int64_t,
                              const SketchCfg&, PackScratch&,
                              std::vector<uint64_t>&) { return false; }

#endif

// Dispatch: SIMD when compiled in and the (TL, alignment) envelope
// fits, else the scalar rolling loop.  Identical output (up to order).
inline void sketch_span(const uint8_t* codes, int64_t size, int64_t start,
                        int64_t end, const SketchCfg& c, PackScratch& P,
                        std::vector<uint64_t>& out) {
    if (simd_sketch_supported() &&
        sketch_chunk_simd(codes, size, start, end, c, P, out))
        return;
    sketch_chunk(codes, size, start, end, c, out);
}

}  // namespace kssd
