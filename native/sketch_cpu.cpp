// sketch_cpu — host-side KSSD window decomposition for CPU fallback and
// host-parallel pre-filtering.
//
// Same semantics as the device kernels (metakssd_tpu/ops/golden.py, the
// bit-exact model of reference iseq2comem.c:240-311) but engineered for
// CPU caches instead of the reference's design: see sketch_core.h for
// the inner loop.  The reference walks a 64 MiB int table (DRAM-latency
// per window) and inserts into an open-addressing hash; we emit a flat
// drtuple vector and let the caller sort/unique.
//
// OpenMP parallelises over stream chunks with a TL-1 overlap so every
// window is evaluated exactly once.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "sketch_core.h"

extern "C" {

// Returns the number of accepted drtuples written to *out_ptr (malloc'd;
// caller frees with sketch_cpu_free).  nthreads <= 0 = OpenMP default.
int64_t sketch_cpu_run(const uint8_t* codes, int64_t size, int k, int subk,
                       int drlevel, const uint32_t* accept_tups,
                       const uint32_t* pfilters, int64_t n_accept,
                       const uint32_t* bitmask, int nthreads,
                       uint64_t** out_ptr) {
    std::vector<uint32_t> premask =
        kssd::build_premask(accept_tups, n_accept);
    kssd::SketchCfg cfg{k, subk, drlevel, accept_tups, pfilters, n_accept,
                        bitmask, premask.data()};
    const int TL = 2 * k;
    if (size < TL) { *out_ptr = nullptr; return 0; }

    int nt = 1;
#ifdef _OPENMP
    nt = nthreads > 0 ? nthreads : omp_get_max_threads();
#endif
    const int64_t nwin = size - TL + 1;
    const int64_t chunk = (nwin + nt - 1) / nt;
    std::vector<std::vector<uint64_t>> parts(nt);

    // Sub-block the per-thread range so the SIMD path's pack scratch
    // stays L1/L2-resident (sketch_span falls back to the scalar
    // rolling loop off the AVX-512 envelope).
    constexpr int64_t SUB = 48 << 10;
#ifdef _OPENMP
#pragma omp parallel for num_threads(nt) schedule(static, 1)
#endif
    for (int t = 0; t < nt; t++) {
        int64_t s = (int64_t)t * chunk;
        int64_t e = s + chunk < nwin ? s + chunk : nwin;
        kssd::PackScratch scratch;
        for (int64_t b = s; b < e; b += SUB)
            kssd::sketch_span(codes, size, b,
                              b + SUB < e ? b + SUB : e, cfg, scratch,
                              parts[t]);
    }

    int64_t total = 0;
    for (auto& p : parts) total += (int64_t)p.size();
    uint64_t* out = (uint64_t*)malloc(sizeof(uint64_t) * (total ? total : 1));
    int64_t off = 0;
    for (auto& p : parts) {
        memcpy(out + off, p.data(), p.size() * sizeof(uint64_t));
        off += (int64_t)p.size();
    }
    *out_ptr = out;
    return total;
}

void sketch_cpu_free(uint64_t* p) { free(p); }

}  // extern "C"
