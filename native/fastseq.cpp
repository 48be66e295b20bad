// fastseq — native sequence ingestion for metakssd_tpu.
//
// Parses fasta/fastq (plain or gzip) into the 2-bit code stream consumed
// by the device sketch kernels: bytes 0-3 = A/C/G/T (case-insensitive),
// 255 = window reset (header, N/any other char, record boundary,
// quality-filtered base).  Semantics mirror metakssd_tpu/io/seqio.py,
// which mirrors the reference per-char loop (reference iseq2comem.c:
// 240-311: newlines don't reset, any non-ACGT char does).
//
// Exposed via a C ABI for ctypes.  Build: make -C native

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

constexpr uint8_t RESET = 255;

struct LUT {
    uint8_t m[256];
    LUT() {
        memset(m, RESET, sizeof(m));
        m[(unsigned)'A'] = m[(unsigned)'a'] = 0;
        m[(unsigned)'C'] = m[(unsigned)'c'] = 1;
        m[(unsigned)'G'] = m[(unsigned)'g'] = 2;
        m[(unsigned)'T'] = m[(unsigned)'t'] = 3;
    }
};
const LUT kLut;

// Streamed line reader over gzFile (zlib transparently handles plain files).
class LineReader {
  public:
    explicit LineReader(const char* path)
        : f_(gzopen(path, "rb")), buf_(1 << 20), len_(0), pos_(0) {}
    ~LineReader() { if (f_) gzclose(f_); }
    bool ok() const { return f_ != nullptr; }

    // Returns pointer+length of next line (no trailing \n / \r), or
    // nullptr at EOF.  The pointer is valid until the next call.
    const char* next(size_t* out_len) {
        line_.clear();
        for (;;) {
            if (pos_ >= len_) {
                int n = gzread(f_, buf_.data(), (unsigned)buf_.size());
                if (n <= 0) {
                    if (line_.empty()) return nullptr;
                    break;
                }
                len_ = (size_t)n;
                pos_ = 0;
            }
            char* nl = (char*)memchr(buf_.data() + pos_, '\n', len_ - pos_);
            size_t chunk = nl ? (size_t)(nl - (buf_.data() + pos_))
                              : len_ - pos_;
            line_.append(buf_.data() + pos_, chunk);
            pos_ += chunk + (nl ? 1 : 0);
            if (nl) break;
        }
        size_t n = line_.size();
        if (n && line_[n - 1] == '\r') n--;
        *out_len = n;
        return line_.data();
    }

  private:
    gzFile f_;
    std::vector<char> buf_;
    size_t len_, pos_;
    std::string line_;
};

struct ParseResult {
    std::vector<uint8_t> codes;
    std::vector<int64_t> starts;   // per-read start offsets (+ total)
};

void translate_append(std::vector<uint8_t>& out, const char* s, size_t n) {
    size_t base = out.size();
    out.resize(base + n);
    for (size_t i = 0; i < n; i++)
        out[base + i] = kLut.m[(uint8_t)s[i]];
}

}  // namespace

extern "C" {

// Opaque handle API: parse into an internal result, query sizes, copy
// out, free.
void* fastseq_parse_fasta(const char* path) {
    LineReader r(path);
    if (!r.ok()) return nullptr;
    auto* res = new ParseResult();
    size_t n;
    while (const char* line = r.next(&n)) {
        if (n == 0) continue;
        if (line[0] == '>') {
            res->starts.push_back((int64_t)res->codes.size());
            res->codes.push_back(RESET);
            continue;
        }
        translate_append(res->codes, line, n);
    }
    return res;
}

void* fastseq_parse_fastq(const char* path, int min_qual) {
    LineReader r(path);
    if (!r.ok()) return nullptr;
    auto* res = new ParseResult();
    size_t n;
    std::string seq;
    for (;;) {
        const char* h = r.next(&n);          // @header
        if (!h) break;
        const char* s = r.next(&n);          // sequence
        if (!s) break;
        seq.assign(s, n);
        size_t slen = n;
        r.next(&n);                          // +
        const char* q = r.next(&n);          // quality
        res->starts.push_back((int64_t)res->codes.size());
        size_t base = res->codes.size();
        translate_append(res->codes, seq.data(), slen);
        if (min_qual > 0 && q && n == slen) {
            for (size_t i = 0; i < slen; i++)
                if ((uint8_t)q[i] < (uint8_t)min_qual)
                    res->codes[base + i] = RESET;
        }
        res->codes.push_back(RESET);         // record separator
    }
    // sentinel: total length (read i spans starts[i]..starts[i+1])
    res->starts.push_back((int64_t)res->codes.size());
    return res;
}

// ---------------------------------------------------------------------
// Streaming fastq API: bounded-memory ingestion (the reference streams
// 64 KiB buffers / 65536-read batches, iseq2comem.c:655-673; here the
// unit is a caller-sized base budget, reads never split across batches).
// ---------------------------------------------------------------------

struct FqStream {
    LineReader reader;
    int min_qual;
    ParseResult batch;             // reused per batch
    explicit FqStream(const char* path, int q)
        : reader(path), min_qual(q) {}
};

void* fastseq_stream_open(const char* path, int min_qual) {
    auto* s = new FqStream(path, min_qual);
    if (!s->reader.ok()) { delete s; return nullptr; }
    return s;
}

// Parse reads until >= max_bases codes (or EOF).  Returns number of
// reads in the batch (0 = EOF).  Buffers live until the next call.
int64_t fastseq_stream_next(void* h, int64_t max_bases) {
    auto* s = (FqStream*)h;
    s->batch.codes.clear();
    s->batch.starts.clear();
    size_t n;
    std::string seq;
    while ((int64_t)s->batch.codes.size() < max_bases) {
        const char* hd = s->reader.next(&n);
        if (!hd) break;
        const char* sq = s->reader.next(&n);
        if (!sq) break;
        seq.assign(sq, n);
        size_t slen = n;
        s->reader.next(&n);                      // +
        const char* q = s->reader.next(&n);      // quality
        s->batch.starts.push_back((int64_t)s->batch.codes.size());
        size_t base = s->batch.codes.size();
        translate_append(s->batch.codes, seq.data(), slen);
        if (s->min_qual > 0 && q && n == slen) {
            for (size_t i = 0; i < slen; i++)
                if ((uint8_t)q[i] < (uint8_t)s->min_qual)
                    s->batch.codes[base + i] = RESET;
        }
        s->batch.codes.push_back(RESET);
    }
    int64_t nreads = (int64_t)s->batch.starts.size();
    s->batch.starts.push_back((int64_t)s->batch.codes.size());
    return nreads;
}

int64_t fastseq_stream_n_codes(void* h) {
    return (int64_t)((FqStream*)h)->batch.codes.size();
}
const uint8_t* fastseq_stream_codes_ptr(void* h) {
    return ((FqStream*)h)->batch.codes.data();
}
const int64_t* fastseq_stream_starts_ptr(void* h) {
    return ((FqStream*)h)->batch.starts.data();
}
void fastseq_stream_close(void* h) { delete (FqStream*)h; }

int64_t fastseq_n_codes(void* h) {
    return (int64_t)((ParseResult*)h)->codes.size();
}
int64_t fastseq_n_starts(void* h) {
    return (int64_t)((ParseResult*)h)->starts.size();
}
const uint8_t* fastseq_codes_ptr(void* h) {
    return ((ParseResult*)h)->codes.data();
}
const int64_t* fastseq_starts_ptr(void* h) {
    return ((ParseResult*)h)->starts.data();
}
void fastseq_free(void* h) { delete (ParseResult*)h; }

// 2-bit pack a [start, start+n) range of a code array into the layout
// the device kernels unpack (base i -> bits 2*(i%16) of packed[i/16];
// validity bit i%32 of vmask[i/32]; see sketch_xla.pack_codes).
// Positions beyond the array (or beyond n, up to the 32-aligned npad)
// are invalid.  One pass, no intermediate buffers.
void fastseq_pack_range(const uint8_t* codes, int64_t size, int64_t start,
                        int64_t n, int64_t npad,
                        uint32_t* packed, uint32_t* vmask) {
    memset(packed, 0, (size_t)(npad / 16) * 4);
    memset(vmask, 0, (size_t)(npad / 32) * 4);
    int64_t lo = start < 0 ? -start : 0;             // clamp to array
    int64_t hi = n;
    if (start + hi > size) hi = size - start;
    for (int64_t i = lo; i < hi; i++) {
        uint8_t c = codes[start + i];
        if (c < 4) {
            packed[i >> 4] |= (uint32_t)c << (2 * (i & 15));
            vmask[i >> 5] |= 1u << (i & 31);
        }
    }
}

// Bulk "name\tvalue\n" line formatting (glibc %f, exactly what the
// reference's printf emits, command_composite.c:322-346).  Python-side
// float formatting is the hot loop of abv_search when a query touches
// most samples; snprintf here is ~5x faster.  Returns bytes written,
// or -1 if out_cap would overflow.
int64_t format_name_float_lines(const char* names_blob,
                                const int64_t* name_off,
                                const int32_t* order, const double* vals,
                                int64_t n, char* out, int64_t out_cap) {
    char* p = out;
    char* end = out + out_cap;
    for (int64_t i = 0; i < n; i++) {
        int64_t s = order[i];
        int64_t len = name_off[s + 1] - name_off[s];
        if (p + len + 34 > end) return -1;
        memcpy(p, names_blob + name_off[s], (size_t)len);
        p += len;
        *p++ = '\t';
        int w = snprintf(p, (size_t)(end - p), "%f\n", vals[i]);
        if (w < 0 || p + w > end) return -1;
        p += w;
    }
    return p - out;
}

}  // extern "C"
