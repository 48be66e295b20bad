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
#include <thread>
#include <mutex>
#include <condition_variable>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#if defined(__AVX2__)
#include <immintrin.h>
#endif
#ifdef _OPENMP
#include <omp.h>
#endif

#include "sketch_core.h"

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

// Vectorized base->code translate: codes from the (c>>1)&3 ASCII trick
// (A0 C1 G3 T2) bit-swapped to the table's A0 C1 G2 T3, invalid bytes
// blended to RESET.  Verified to match kLut on all 256 byte values.
// The tail is handled with one overlapping 32-byte vector (outputs are
// pure functions of inputs, so re-writing a span is safe) — important
// because fastq reads are ~100 bp and a scalar tail would be ~1/3 of
// the work.  ~2.5x the scalar LUT on this host (memory-bound at ~4 GB/s).
inline void translate_span(const char* s, uint8_t* o, size_t n) {
#if defined(__AVX2__)
    if (n >= 32) {
        const __m256i m3 = _mm256_set1_epi8(3);
        const __m256i m1 = _mm256_set1_epi8(1);
        const __m256i mDF = _mm256_set1_epi8((char)0xDF);
        const __m256i A = _mm256_set1_epi8('A'), C = _mm256_set1_epi8('C'),
                      G = _mm256_set1_epi8('G'), T = _mm256_set1_epi8('T');
        const __m256i rst = _mm256_set1_epi8((char)RESET);
        size_t j = 0;
        for (;;) {
            __m256i v = _mm256_loadu_si256((const __m256i*)(s + j));
            __m256i u = _mm256_and_si256(v, mDF);
            __m256i ok = _mm256_or_si256(
                _mm256_or_si256(_mm256_cmpeq_epi8(u, A),
                                _mm256_cmpeq_epi8(u, C)),
                _mm256_or_si256(_mm256_cmpeq_epi8(u, G),
                                _mm256_cmpeq_epi8(u, T)));
            __m256i x = _mm256_and_si256(_mm256_srli_epi16(v, 1), m3);
            __m256i code = _mm256_xor_si256(
                x, _mm256_and_si256(_mm256_srli_epi16(x, 1), m1));
            _mm256_storeu_si256((__m256i*)(o + j),
                                _mm256_blendv_epi8(rst, code, ok));
            if (j + 32 >= n) break;
            j = (j + 64 <= n) ? j + 32 : n - 32;  // overlapping last vector
        }
        return;
    }
#endif
    for (size_t j = 0; j < n; j++) o[j] = kLut.m[(uint8_t)s[j]];
}

// Vectorized quality mask: o[j] = RESET where q[j] < min_qual.
inline void qual_mask_span(const char* q, uint8_t* o, size_t n,
                           int min_qual) {
#if defined(__AVX2__)
    if (n >= 32) {
        const __m256i mq = _mm256_set1_epi8((char)(uint8_t)min_qual);
        const __m256i rst = _mm256_set1_epi8((char)RESET);
        size_t j = 0;
        for (;;) {
            __m256i v = _mm256_loadu_si256((const __m256i*)(q + j));
            // ok (q >= min_qual, unsigned) <=> max_epu8(q, mq) == q
            __m256i ok = _mm256_cmpeq_epi8(_mm256_max_epu8(v, mq), v);
            __m256i cur = _mm256_loadu_si256((const __m256i*)(o + j));
            _mm256_storeu_si256((__m256i*)(o + j),
                                _mm256_blendv_epi8(rst, cur, ok));
            if (j + 32 >= n) break;
            j = (j + 64 <= n) ? j + 32 : n - 32;
        }
        return;
    }
#endif
    for (size_t j = 0; j < n; j++)
        if ((uint8_t)q[j] < (uint8_t)min_qual) o[j] = RESET;
}

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
    translate_span(s, out.data() + base, n);
}

// ---------------------------------------------------------------------
// Chunked zero-copy fastq scanner: records are located with memchr in a
// large refillable buffer and translated to codes in one OpenMP pass —
// no per-line std::string copies.  Record semantics match the LineReader
// path exactly (4 newline-delimited lines per record; a record with a
// sequence line but truncated +/quality lines is still emitted; the
// quality mask applies only when qual length == seq length; trailing \r
// stripped; EOF mid-header or mid-sequence drops the partial record).
// ---------------------------------------------------------------------

struct FqRec {
    size_t seq_off;
    size_t q_off;
    int32_t slen;
    int32_t qlen;   // -1 = no quality line
};

// ---------------------------------------------------------------------
// Byte source with decompress-ahead: gzip members inflate on a
// background thread into a bounded ring so inflate overlaps
// parse+translate+sketch (the reference gets the same overlap for free
// from its popen("zcat") child process, iseq2comem.c:669).  Plain files
// read synchronously — the pass-through costs nothing to hide.
// ---------------------------------------------------------------------

struct MappedFile {
    const char* data = nullptr;
    size_t size = 0;
    int fd = -1;

    // Regular, seekable file (any content).
    bool open_plain_gz(const char* path) {
        fd = ::open(path, O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        if (fstat(fd, &st) != 0 || !S_ISREG(st.st_mode)) return false;
        size = (size_t)st.st_size;
        if (size == 0) { data = ""; return true; }
        void* p = mmap(nullptr, size, PROT_READ,
                       MAP_SHARED | MAP_POPULATE, fd, 0);
        if (p == MAP_FAILED)
            p = mmap(nullptr, size, PROT_READ, MAP_SHARED, fd, 0);
        if (p == MAP_FAILED) return false;
        madvise(p, size, MADV_SEQUENTIAL);
        madvise(p, size, MADV_WILLNEED);
        data = (const char*)p;
        return true;
    }

    // Regular, seekable, non-gzip file only.
    bool open_plain(const char* path) {
        if (!open_plain_gz(path)) return false;
        if (size >= 2 && (uint8_t)data[0] == 0x1f &&
            (uint8_t)data[1] == 0x8b)
            return false;                          // gzip
        return true;
    }
    ~MappedFile() {
        if (data && size) munmap((void*)data, size);
        if (fd >= 0) ::close(fd);
    }
};

// BGZF probe: gzip member with FEXTRA carrying the 'BC' subfield (the
// bgzip block-size field).  Such files are sequences of independent
// <=64 KiB members — inflatable in parallel (plain gzip is inherently
// serial; bgzip/htslib output is the common parallel-friendly case).
struct BgzfBlock {
    int64_t off;      // compressed offset
    int32_t csize;    // compressed size (whole member)
};

static bool bgzf_scan(const char* data, int64_t size,
                      std::vector<BgzfBlock>& blocks) {
    int64_t o = 0;
    while (o < size) {
        if (o + 18 > size) return false;
        const uint8_t* h = (const uint8_t*)data + o;
        // FLG must be exactly FEXTRA (bgzip's output): any extra header
        // field (FNAME/FCOMMENT/FHCRC) would shift the deflate offset
        // that bgzf_inflate assumes, so such files take the serial path
        if (h[0] != 0x1f || h[1] != 0x8b || h[2] != 8 || h[3] != 4)
            return false;
        int xlen = h[10] | (h[11] << 8);
        if (o + 12 + xlen > size) return false;
        // find the BC subfield inside the extra area
        int p = 0, bsize = -1;
        const uint8_t* x = h + 12;
        while (p + 4 <= xlen) {
            int slen = x[p + 2] | (x[p + 3] << 8);
            // payload must fit inside the extra area before we read it
            // (a truncated FEXTRA at the end of the mapping would
            // otherwise read past the mmap -> SIGBUS on aligned files)
            if (p + 4 + slen > xlen) return false;
            if (x[p] == 'B' && x[p + 1] == 'C' && slen == 2) {
                bsize = (x[p + 4] | (x[p + 5] << 8)) + 1;
                break;
            }
            p += 4 + slen;
        }
        if (bsize <= 0 || o + bsize > size) return false;
        blocks.push_back({o, bsize});
        o += bsize;
    }
    return !blocks.empty();
}

// Inflate one BGZF member (raw deflate after the header) into dst.
// Returns the uncompressed length, or -1 on error.
static int64_t bgzf_inflate(const char* data, const BgzfBlock& b,
                            std::vector<char>& dst) {
    const uint8_t* h = (const uint8_t*)data + b.off;
    int xlen = h[10] | (h[11] << 8);
    int hdr = 12 + xlen;
    if (b.csize < hdr + 8) return -1;
    uint32_t isize;
    memcpy(&isize, data + b.off + b.csize - 4, 4);
    // isize==0 (the BGZF EOF member) still needs a non-NULL next_out:
    // a fresh slot's empty vector has data()==NULL and zlib returns
    // Z_STREAM_ERROR on it, which used to poison small (<16-member)
    // files whose EOF block landed on a never-used ring slot.
    if (dst.size() < (size_t)(isize ? isize : 1))
        dst.resize(isize ? isize : 1);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -1;
    zs.next_in = (Bytef*)(data + b.off + hdr);
    zs.avail_in = (uInt)(b.csize - hdr - 8);
    zs.next_out = (Bytef*)dst.data();
    zs.avail_out = (uInt)dst.size();
    int r = inflate(&zs, Z_FINISH);
    int64_t got = (int64_t)zs.total_out;
    inflateEnd(&zs);
    if (r != Z_STREAM_END || got != (int64_t)isize) return -1;
    return got;
}

class Source {
  public:
    explicit Source(const char* path) {
        FILE* probe = fopen(path, "rb");
        bool is_gz = false;
        if (probe) {
            unsigned char m[2];
            is_gz = fread(m, 1, 2, probe) == 2 && m[0] == 0x1f &&
                    m[1] == 0x8b;
            fclose(probe);
        }
        if (is_gz && !getenv("MKSSD_NO_BGZF") &&
            mf_.open_plain_gz(path) &&
            bgzf_scan(mf_.data, (int64_t)mf_.size, blocks_)) {
            // parallel BGZF inflate: workers claim blocks round-robin
            // into an ordered ring ahead of the consumer
            bgzf_ = true;
            int nt = (int)std::thread::hardware_concurrency();
            if (nt > 4) nt = 4;
            if (nt < 1) nt = 1;
            if ((int64_t)blocks_.size() < nt) nt = (int)blocks_.size();
            slots_.resize(NSLOTS);
            for (int t = 0; t < nt; t++)
                workers_.emplace_back([this, t, nt] { bgzf_work(t, nt); });
            return;
        }
        f_ = gzopen(path, "rb");
        if (!f_) return;
        if (is_gz) {
            for (auto& c : ring_) c.buf.resize(CHUNK);
            th_ = std::thread([this] { produce(); });
            threaded_ = true;
        }
    }
    ~Source() {
        if (threaded_ || bgzf_) {
            {
                std::lock_guard<std::mutex> g(mu_);
                stop_ = true;
            }
            cv_free_.notify_all();
            cv_fill_.notify_all();
            if (threaded_) th_.join();
            for (auto& w : workers_) w.join();
        }
        if (f_) gzclose(f_);
    }
    bool ok() const { return f_ != nullptr || bgzf_; }

    // Fill dst with up to cap bytes; 0 = EOF, <0 = error.
    int64_t read(char* dst, size_t cap) {
        if (bgzf_) return bgzf_read(dst, cap);
        if (!threaded_) {
            int n = gzread(f_, dst, (unsigned)cap);
            return (int64_t)n;
        }
        size_t got = 0;
        while (got < cap) {
            std::unique_lock<std::mutex> lk(mu_);
            cv_fill_.wait(lk, [this] {
                return nfill_ > 0 || done_ || err_;
            });
            if (nfill_ == 0) {                // drained: clean EOF or err
                if (err_) return -1;
                break;
            }
            Chunk& c = ring_[head_];
            size_t take = c.len - c.off;
            if (take > cap - got) take = cap - got;
            lk.unlock();
            memcpy(dst + got, c.buf.data() + c.off, take);
            got += take;
            lk.lock();
            c.off += take;
            if (c.off == c.len) {
                head_ = (head_ + 1) % NRING;
                nfill_--;
                lk.unlock();
                cv_free_.notify_one();
            }
            if (got == cap) break;
        }
        return (int64_t)got;
    }

  private:
    void produce() {
        for (;;) {
            std::unique_lock<std::mutex> lk(mu_);
            cv_free_.wait(lk, [this] {
                return nfill_ < NRING || stop_;
            });
            if (stop_) return;
            Chunk& c = ring_[(head_ + nfill_) % NRING];
            lk.unlock();
            int n = gzread(f_, c.buf.data(), (unsigned)CHUNK);
            lk.lock();
            if (n <= 0) {
                if (n < 0) err_ = true;
                done_ = true;
                lk.unlock();
                cv_fill_.notify_all();
                return;
            }
            c.len = (size_t)n;
            c.off = 0;
            nfill_++;
            lk.unlock();
            cv_fill_.notify_one();
        }
    }

    // ---- BGZF parallel inflate -----------------------------------
    struct Slot {
        std::vector<char> buf;
        int64_t len = 0, off = 0;
        int64_t id = -1;                  // block index held (-1 = free)
    };

    void bgzf_work(int t, int nt) {
        for (int64_t bi = t; bi < (int64_t)blocks_.size(); bi += nt) {
            Slot& s = slots_[bi % NSLOTS];
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_free_.wait(lk, [&] {
                    return stop_ || consumed_ + NSLOTS > bi;
                });
                if (stop_) return;
            }
            int64_t n = bgzf_inflate(mf_.data, blocks_[bi], s.buf);
            std::lock_guard<std::mutex> g(mu_);
            if (n < 0) {
                err_ = true;
                if (bi < err_block_) err_block_ = bi;
            }
            s.len = n < 0 ? 0 : n;
            s.off = 0;
            s.id = bi;
            cv_fill_.notify_all();
        }
    }

    int64_t bgzf_read(char* dst, size_t cap) {
        size_t got = 0;
        while (got < cap && next_ < (int64_t)blocks_.size()) {
            Slot& s = slots_[next_ % NSLOTS];
            std::unique_lock<std::mutex> lk(mu_);
            // honor a decode error only once every block BEFORE the
            // failed one has been drained — a bad later block must not
            // discard valid decoded data ahead of it
            cv_fill_.wait(lk, [&] {
                return s.id == next_ || (err_ && next_ >= err_block_);
            });
            if (err_ && next_ >= err_block_) return -1;
            size_t take = (size_t)(s.len - s.off);
            if (take > cap - got) take = cap - got;
            lk.unlock();
            memcpy(dst + got, s.buf.data() + s.off, take);
            got += take;
            lk.lock();
            s.off += take;
            if (s.off == s.len) {
                s.id = -1;
                consumed_ = ++next_;
                lk.unlock();
                cv_free_.notify_all();
            }
        }
        return (int64_t)got;
    }

    static constexpr size_t CHUNK = 4 << 20;
    static constexpr int NRING = 4;
    static constexpr int NSLOTS = 16;
    struct Chunk {
        std::vector<char> buf;
        size_t len = 0, off = 0;
    };
    gzFile f_ = nullptr;
    bool threaded_ = false;
    Chunk ring_[NRING];
    int head_ = 0, nfill_ = 0;
    bool done_ = false, err_ = false, stop_ = false;
    std::mutex mu_;
    std::condition_variable cv_fill_, cv_free_;
    std::thread th_;
    // BGZF state
    bool bgzf_ = false;
    MappedFile mf_;
    std::vector<BgzfBlock> blocks_;
    std::vector<Slot> slots_;
    std::vector<std::thread> workers_;
    int64_t next_ = 0, consumed_ = 0;
    int64_t err_block_ = INT64_MAX;   // lowest block index that failed
};

class FqChunker {
  public:
    explicit FqChunker(const char* path)
        : src_(path), buf_(16 << 20) {}
    bool ok() const { return src_.ok(); }

    enum ScanStatus { NEED_MORE, BATCH_FULL, AT_EOF };

    // Append complete records available in the buffer until ~max_bases
    // sequence bytes have been collected.  Offsets stay valid until the
    // next refill().
    ScanStatus scan(int64_t max_bases, std::vector<FqRec>& recs,
                    int64_t* bases) {
        for (;;) {
            if (*bases >= max_bases) return BATCH_FULL;
            size_t save = pos_;
            size_t save_nl = nl_pos_;
            size_t off[4], n[4];
            bool have[4] = {false, false, false, false};
            int got = 0;
            for (int i = 0; i < 4; i++) {
                int r = line(&off[i], &n[i]);
                if (r == 0) break;          // EOF: no more lines
                if (r < 0) {                // line spans buffer end
                    pos_ = save;
                    nl_pos_ = save_nl;
                    return NEED_MORE;
                }
                have[i] = true;
                got = i + 1;
            }
            if (got < 2) {
                if (eof_) return AT_EOF;     // drop partial record
                pos_ = save;
                nl_pos_ = save_nl;
                return NEED_MORE;
            }
            (void)have;
            FqRec rec;
            rec.seq_off = off[1];
            rec.slen = (int32_t)n[1];
            rec.q_off = got >= 4 ? off[3] : 0;
            rec.qlen = got >= 4 ? (int32_t)n[3] : -1;
            recs.push_back(rec);
            *bases += rec.slen + 1;
        }
    }

    // Compact + read more.  Returns false at EOF with nothing added.
    bool refill() {
        if (pos_ > 0) {
            memmove(buf_.data(), buf_.data() + pos_, len_ - pos_);
            len_ -= pos_;
            // shift the unconsumed newline index with the bytes
            size_t keep = 0;
            for (size_t t = nl_pos_; t < nls_.size(); t++)
                nls_[keep++] = nls_[t] - (int64_t)pos_;
            nls_.resize(keep);
            nl_pos_ = 0;
            scanned_ -= (int64_t)pos_;
            pos_ = 0;
        }
        if (len_ == buf_.size()) buf_.resize(buf_.size() * 2);
        int64_t nread = src_.read(buf_.data() + len_,
                                  buf_.size() - len_);
        if (nread <= 0) {
            eof_ = true;
            if (nread < 0) err_ = true;   // decode error, NOT clean EOF
            return false;
        }
        len_ += (size_t)nread;
        index_newlines();
        return true;
    }

    const char* data() const { return buf_.data(); }
    bool at_eof() const { return eof_ && pos_ >= len_; }
    bool error() const { return err_; }

  private:
    // Index newlines in the newly read region [scanned_, len_) — one
    // vectorized pass instead of a memchr call per line (4 calls per
    // record dominated the scan at short read lengths).
    void index_newlines() {
        const uint8_t* p = (const uint8_t*)buf_.data();
        int64_t i = scanned_, n = (int64_t)len_;
        nls_.reserve(nls_.size() + (size_t)(n - i) / 32 + 8);
#if defined(__AVX2__)
        const __m256i nlv = _mm256_set1_epi8('\n');
        for (; i + 32 <= n; i += 32) {
            uint32_t m = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(
                _mm256_loadu_si256((const __m256i*)(p + i)), nlv));
            while (m) {
                nls_.push_back(i + __builtin_ctz(m));
                m &= m - 1;
            }
        }
#endif
        for (; i < n; i++)
            if (p[i] == '\n') nls_.push_back(i);
        scanned_ = n;
    }

    // 1 = line at [*off, *off+*n), cursor advanced; 0 = EOF, no bytes;
    // -1 = incomplete line (needs refill unless eof_, in which case the
    // tail IS the line).
    int line(size_t* off, size_t* n) {
        if (pos_ >= len_) return eof_ ? 0 : -1;
        if (nl_pos_ >= nls_.size()) {
            if (!eof_) return -1;
            *off = pos_;
            *n = len_ - pos_;
            pos_ = len_;
        } else {
            int64_t nl = nls_[nl_pos_++];
            *off = pos_;
            *n = (size_t)nl - pos_;
            pos_ = (size_t)nl + 1;
        }
        if (*n && buf_[*off + *n - 1] == '\r') (*n)--;
        return 1;
    }

    Source src_;
    std::vector<char> buf_;
    size_t len_ = 0, pos_ = 0;
    bool eof_ = false, err_ = false;
    std::vector<int64_t> nls_;
    size_t nl_pos_ = 0;
    int64_t scanned_ = 0;
};

// Translate a scanned record batch into the codes/starts arrays in one
// parallel pass (the LUT map is the parse hot loop at ~0.5 GB/s/thread).
void translate_batch(const char* buf, const std::vector<FqRec>& recs,
                     int min_qual, std::vector<uint8_t>& codes,
                     std::vector<int64_t>& starts) {
    size_t nrec = recs.size();
    if (!nrec) return;
    size_t base = codes.size();
    std::vector<int64_t> dst(nrec + 1);
    dst[0] = (int64_t)base;
    for (size_t i = 0; i < nrec; i++) {
        starts.push_back(dst[i]);
        dst[i + 1] = dst[i] + recs[i].slen + 1;
    }
    codes.resize((size_t)dst[nrec]);
    uint8_t* out = codes.data();
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < nrec; i++) {
        const FqRec& r = recs[i];
        uint8_t* o = out + dst[i];
        translate_span(buf + r.seq_off, o, (size_t)r.slen);
        if (min_qual > 0 && r.qlen == r.slen)
            qual_mask_span(buf + r.q_off, o, (size_t)r.slen, min_qual);
        o[r.slen] = RESET;
    }
}

// ---------------------------------------------------------------------
// Sharded-file machinery: a regular uncompressed fastq is mmap'd and
// decomposed into fixed byte chunks.  Pass 1 counts newlines per chunk
// (parallel); the prefix sums give every chunk the global index of each
// line starting inside it, so pass 2 can derive the exact same 4-line
// record grouping the streaming scanner produces — deterministically,
// with no serial scan phase at all.  Used by fastseq_sketch_file (the
// per-sample hot path); gz / pipe inputs fall back to the streaming
// scanner.
// ---------------------------------------------------------------------

inline int64_t count_newlines(const char* p, int64_t n) {
    int64_t cnt = 0, i = 0;
#if defined(__AVX512BW__)
    const __m512i nl = _mm512_set1_epi8('\n');
    for (; i + 64 <= n; i += 64) {
        __mmask64 m = _mm512_cmpeq_epi8_mask(
            _mm512_loadu_si512((const void*)(p + i)), nl);
        cnt += __builtin_popcountll((uint64_t)m);
    }
#elif defined(__AVX2__)
    const __m256i nl = _mm256_set1_epi8('\n');
    for (; i + 32 <= n; i += 32) {
        uint32_t m = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(
            _mm256_loadu_si256((const __m256i*)(p + i)), nl));
        cnt += __builtin_popcount(m);
    }
#endif
    for (; i < n; i++) cnt += (p[i] == '\n');
    return cnt;
}

// Append positions (absolute file offsets) of newlines in [lo, hi).
inline void newline_positions(const char* data, int64_t lo, int64_t hi,
                              std::vector<int64_t>& out) {
    int64_t i = lo;
#if defined(__AVX512BW__)
    const __m512i nl = _mm512_set1_epi8('\n');
    for (; i + 64 <= hi; i += 64) {
        uint64_t m = (uint64_t)_mm512_cmpeq_epi8_mask(
            _mm512_loadu_si512((const void*)(data + i)), nl);
        while (m) {
            out.push_back(i + __builtin_ctzll(m));
            m &= m - 1;
        }
    }
#elif defined(__AVX2__)
    const __m256i nl = _mm256_set1_epi8('\n');
    for (; i + 32 <= hi; i += 32) {
        uint32_t m = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(
            _mm256_loadu_si256((const __m256i*)(data + i)), nl));
        while (m) {
            out.push_back(i + __builtin_ctz(m));
            m &= m - 1;
        }
    }
#endif
    for (; i < hi; i++)
        if (data[i] == '\n') out.push_back(i);
}

// Line extent helper for pass 2.  Lines are numbered globally; within a
// chunk the local newline vector covers [cstart, cend) and lines whose
// record tails cross cend are extended with memchr.  A "line" exists
// iff its start offset < file size; EOF acts as a virtual terminator;
// a trailing '\r' is stripped — all exactly matching FqChunker::line().
struct LineWalker {
    const char* data;
    int64_t size;
    const std::vector<int64_t>* nls;  // newlines in [cstart, cend)
    size_t idx = 0;                   // next unconsumed local newline
    int64_t overflow_pos;             // scan cursor past the local vector

    LineWalker(const char* d, int64_t sz, const std::vector<int64_t>* v,
               int64_t cend)
        : data(d), size(sz), nls(v), overflow_pos(cend) {}

    // Extent of the line starting at s; *next_s = start of the line
    // after it.  Returns false if no line starts at s (s >= size).
    bool next(int64_t s, int64_t* n, int64_t* next_s) {
        if (s >= size) return false;
        // advance the local cursor past newlines before s
        while (idx < nls->size() && (*nls)[idx] < s) idx++;
        int64_t e;
        if (idx < nls->size()) {
            e = (*nls)[idx++];
        } else if (overflow_pos >= size) {
            e = size;                      // past EOF: virtual terminator
        } else {
            if (overflow_pos < s) overflow_pos = s;
            const char* hit = (const char*)memchr(
                data + overflow_pos, '\n', (size_t)(size - overflow_pos));
            e = hit ? (int64_t)(hit - data) : size;
            overflow_pos = e + 1;
        }
        int64_t len = e - s;
        if (len > 0 && data[e - 1] == '\r') len--;
        *n = len;
        *next_s = e + 1;
        return true;
    }
};

// Parallel sharded fused sketch over an mmap'd plain fastq.  Chunk
// ownership: chunk c owns the lines starting at p+1 for every newline
// p inside [cstart, cend) (plus line 0 for chunk 0) — a partition of
// all line starts, so each 4-line record is assembled by exactly one
// thread, with lines crossing the chunk end extended via memchr.
// Record semantics (partial tails, CR strip, quality-mask eligibility)
// match the streaming FqChunker path bit for bit.
int64_t sketch_file_sharded(const MappedFile& mf, int min_qual,
                            const kssd::SketchCfg& cfg, int TL, int nt,
                            int64_t* n_reads, int64_t* n_bases,
                            uint64_t** out_ptr) {
    const char* data = mf.data;
    const int64_t size = (int64_t)mf.size;
    int64_t CH = 4 << 20;
    if (const char* e = getenv("MKSSD_SHARD_CHUNK")) {
        int64_t v = atoll(e);                 // test hook: tiny chunks
        if (v >= 64) CH = v;
    }
    const int64_t nchunks = size ? (size + CH - 1) / CH : 0;
    constexpr int64_t BLOCK_BASES = 48 << 10;

    std::vector<int64_t> nlpfx((size_t)nchunks + 1, 0);
    std::vector<std::vector<uint64_t>> parts((size_t)nt);
    std::vector<int64_t> treads((size_t)nt, 0), tbases((size_t)nt, 0);
    const bool dbg = getenv("MKSSD_SKETCH_DEBUG") != nullptr;
    double tp0 = 0, tp1 = 0;
    auto now = [] {
        struct timespec ts;
        clock_gettime(CLOCK_MONOTONIC, &ts);
        return ts.tv_sec + 1e-9 * ts.tv_nsec;
    };
    if (dbg) tp0 = now();

#ifdef _OPENMP
#pragma omp parallel num_threads(nt)
#endif
    {
        int tid = 0;
#ifdef _OPENMP
        tid = omp_get_thread_num();
#endif
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
        for (int64_t c = 0; c < nchunks; c++) {
            int64_t lo = c * CH, hi = lo + CH < size ? lo + CH : size;
            nlpfx[(size_t)c + 1] = count_newlines(data + lo, hi - lo);
        }
#ifdef _OPENMP
#pragma omp single
#endif
        {
            for (int64_t c = 0; c < nchunks; c++)
                nlpfx[(size_t)c + 1] += nlpfx[(size_t)c];
            if (dbg) tp1 = now();
        }

        std::vector<int64_t> L;                 // chunk newline positions
        std::vector<uint8_t> lb;                // translated code block
        kssd::PackScratch scratch;
        std::vector<uint64_t>& out = parts[tid];
        int64_t my_reads = 0, my_bases = 0;

        auto flush_lb = [&]() {
            int64_t sz = (int64_t)lb.size();
            if (sz >= TL)
                kssd::sketch_span(lb.data(), sz, 0, sz - TL + 1, cfg,
                                  scratch, out);
            lb.clear();
        };

#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1) nowait
#endif
        for (int64_t c = 0; c < nchunks; c++) {
            int64_t lo = c * CH, hi = lo + CH < size ? lo + CH : size;
            L.clear();
            newline_positions(data, lo, hi, L);
            LineWalker wk(data, size, &L, hi);

            auto emit = [&](int64_t soff, int64_t slen, int64_t qoff,
                            int64_t qlen) {
                size_t base = lb.size();
                lb.resize(base + (size_t)slen + 1);
                uint8_t* o = lb.data() + base;
                translate_span(data + soff, o, (size_t)slen);
                if (min_qual > 0 && qlen == slen)
                    qual_mask_span(data + qoff, o, (size_t)slen, min_qual);
                o[slen] = RESET;
                my_reads++;
                my_bases += slen;
                if ((int64_t)lb.size() >= BLOCK_BASES) flush_lb();
            };

            // slow path (chunk-tail records whose lines cross the chunk
            // end, and chunk 0's line-0 record): walk lines one by one
            auto handle_header = [&](int64_t hstart) {
                int64_t lens[4], offs[4];
                int got = 0;
                int64_t cur = hstart;
                for (int i = 0; i < 4; i++) {
                    int64_t ln, nxt;
                    if (!wk.next(cur, &ln, &nxt)) break;
                    offs[i] = cur;
                    lens[i] = ln;
                    got = i + 1;
                    cur = nxt;
                }
                if (got < 2) return;
                emit(offs[1], lens[1], got >= 4 ? offs[3] : 0,
                     got >= 4 ? lens[3] : (int64_t)-1);
            };

            if (c == 0 && size > 0) handle_header(0);
            int64_t nl_before = nlpfx[(size_t)c];
            size_t R = L.size();
            // owned headers start at L[r]+1 with global line index
            // nl_before+r+1 ≡ 0 (mod 4) → r ≡ -(nl_before+1) (mod 4)
            size_t r0 = (size_t)((-(nl_before + 1)) & 3);
            size_t r = r0;
            // fast path: all 4 record lines terminate inside L — derive
            // extents by direct indexing (records are exactly 4 lines,
            // so owned headers stride by 4 newlines)
            for (; r + 4 < R; r += 4) {
                int64_t s1 = L[r + 1] + 1, e1 = L[r + 2];
                int64_t n1 = e1 - s1;
                if (n1 > 0 && data[e1 - 1] == '\r') n1--;
                int64_t s3 = L[r + 3] + 1, e3 = L[r + 4];
                int64_t n3 = e3 - s3;
                if (n3 > 0 && data[e3 - 1] == '\r') n3--;
                emit(s1, n1, s3, n3);
            }
            for (; r < R; r += 4) handle_header(L[r] + 1);
            flush_lb();
        }

        treads[tid] = my_reads;
        tbases[tid] = my_bases;
    }

    if (dbg)
        fprintf(stderr, "sharded: pass1(count)=%.3f s pass2=%.3f s\n",
                tp1 - tp0, now() - tp1);
    *n_reads = 0;
    *n_bases = 0;
    for (int t = 0; t < nt; t++) {
        *n_reads += treads[t];
        *n_bases += tbases[t];
    }
    int64_t total = 0;
    for (auto& p : parts) total += (int64_t)p.size();
    uint64_t* out =
        (uint64_t*)malloc(sizeof(uint64_t) * (size_t)(total ? total : 1));
    int64_t off = 0;
    for (auto& p : parts) {
        memcpy(out + off, p.data(), p.size() * sizeof(uint64_t));
        off += (int64_t)p.size();
    }
    *out_ptr = out;
    return total;
}

}  // namespace

extern "C" {

// Cap the OpenMP thread count for every native kernel in this library
// (the CLI -p flag; reference threads its hot loops the same way,
// command_dist_wrapper.c:45).
void fastseq_set_threads(int n) {
#ifdef _OPENMP
    if (n > 0) omp_set_num_threads(n);
#endif
    (void)n;
}

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
    FqChunker c(path);
    if (!c.ok()) return nullptr;
    auto* res = new ParseResult();
    std::vector<FqRec> recs;
    int64_t bases = 0;
    for (;;) {
        recs.clear();
        FqChunker::ScanStatus st =
            c.scan(INT64_MAX, recs, &bases);
        // translate before refill() — offsets die on compaction
        translate_batch(c.data(), recs, min_qual, res->codes,
                        res->starts);
        if (st == FqChunker::AT_EOF) break;
        if (st == FqChunker::NEED_MORE && !c.refill()) {
            if (c.error()) { delete res; return nullptr; }  // bad gz
            // EOF hit: one final scan consumes the newline-less tail
            recs.clear();
            c.scan(INT64_MAX, recs, &bases);
            translate_batch(c.data(), recs, min_qual, res->codes,
                            res->starts);
            break;
        }
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
    FqChunker chunker;
    int min_qual;
    bool done = false;
    ParseResult batch;             // reused per batch
    explicit FqStream(const char* path, int q)
        : chunker(path), min_qual(q) {}
};

void* fastseq_stream_open(const char* path, int min_qual) {
    auto* s = new FqStream(path, min_qual);
    if (!s->chunker.ok()) { delete s; return nullptr; }
    return s;
}

// Parse reads until >= max_bases codes (or EOF).  Returns number of
// reads in the batch (0 = EOF).  Buffers live until the next call.
int64_t fastseq_stream_next(void* h, int64_t max_bases) {
    auto* s = (FqStream*)h;
    s->batch.codes.clear();
    s->batch.starts.clear();
    std::vector<FqRec> recs;
    int64_t bases = 0;
    while (!s->done) {
        recs.clear();
        FqChunker::ScanStatus st =
            s->chunker.scan(max_bases, recs, &bases);
        // translate before refill() — offsets die on compaction
        translate_batch(s->chunker.data(), recs, s->min_qual,
                        s->batch.codes, s->batch.starts);
        if (st == FqChunker::BATCH_FULL) break;
        if (st == FqChunker::AT_EOF) { s->done = true; break; }
        if (!s->chunker.refill()) {
            if (s->chunker.error()) { s->done = true; return -1; }
            recs.clear();
            s->chunker.scan(max_bases, recs, &bases);
            translate_batch(s->chunker.data(), recs, s->min_qual,
                            s->batch.codes, s->batch.starts);
            s->done = true;
            break;
        }
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

// ---------------------------------------------------------------------
// Fused fastq -> drtuples: parse, translate, and sketch in one pass
// (the per-sample hot path, reference mt_shortreads2koc
// iseq2comem.c:655-727).  Scanned record batches are cut into ~48 KiB
// contiguous record blocks; each OpenMP thread translates its block
// into a thread-local code buffer (RESET-separated, L1/L2-resident) and
// immediately runs the sketch inner loop over it — the full-size codes
// array never exists, and translate+sketch parallelise together instead
// of alternating serial phases.
// ---------------------------------------------------------------------

int64_t fastseq_sketch_file(const char* path, int min_qual,
                            int k, int subk, int drlevel,
                            const uint32_t* accept_tups,
                            const uint32_t* pfilters, int64_t n_accept,
                            const uint32_t* bitmask, int nthreads,
                            int64_t* n_reads, int64_t* n_bases,
                            uint64_t** out_ptr) {
    *n_reads = 0;
    *n_bases = 0;
    *out_ptr = nullptr;
    std::vector<uint32_t> premask =
        kssd::build_premask(accept_tups, n_accept);
    kssd::SketchCfg cfg{k, subk, drlevel, accept_tups, pfilters, n_accept,
                        bitmask, premask.data()};
    const int TL = 2 * k;
    int nt = 1;
#ifdef _OPENMP
    nt = nthreads > 0 ? nthreads : omp_get_max_threads();
#endif
    {
        // plain regular files take the fully parallel sharded path
        // (serial-scan-free; see sketch_file_sharded)
        MappedFile mf;
        if (mf.open_plain(path) && !getenv("MKSSD_NO_SHARDED_SKETCH"))
            return sketch_file_sharded(mf, min_qual, cfg, TL, nt,
                                       n_reads, n_bases, out_ptr);
    }
    FqChunker c(path);
    if (!c.ok()) return -1;
    std::vector<std::vector<uint64_t>> parts(nt);
    std::vector<std::vector<uint8_t>> lbufs(nt);
    std::vector<kssd::PackScratch> scratches(nt);

    constexpr int64_t BLOCK_BASES = 48 << 10;
    std::vector<FqRec> recs;
    std::vector<size_t> cuts;   // block boundaries into recs

    auto process = [&](const std::vector<FqRec>& rs) {
        size_t nrec = rs.size();
        if (!nrec) return;
        *n_reads += (int64_t)nrec;
        cuts.clear();
        cuts.push_back(0);
        int64_t acc = 0;
        for (size_t i = 0; i < nrec; i++) {
            acc += rs[i].slen + 1;
            if (acc >= BLOCK_BASES) { cuts.push_back(i + 1); acc = 0; }
        }
        if (cuts.back() != nrec) cuts.push_back(nrec);
        const char* buf = c.data();
        int nblk = (int)cuts.size() - 1;
#ifdef _OPENMP
#pragma omp parallel num_threads(nt)
#endif
        {
            int tid = 0;
#ifdef _OPENMP
            tid = omp_get_thread_num();
#endif
            std::vector<uint8_t>& lb = lbufs[tid];
            std::vector<uint64_t>& out = parts[tid];
            kssd::PackScratch& scratch = scratches[tid];
            int64_t my_bases = 0;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1)
#endif
            for (int b = 0; b < nblk; b++) {
                lb.clear();
                for (size_t i = cuts[b]; i < cuts[b + 1]; i++) {
                    const FqRec& r = rs[i];
                    size_t base = lb.size();
                    lb.resize(base + (size_t)r.slen + 1);
                    uint8_t* o = lb.data() + base;
                    translate_span(buf + r.seq_off, o, (size_t)r.slen);
                    if (min_qual > 0 && r.qlen == r.slen)
                        qual_mask_span(buf + r.q_off, o, (size_t)r.slen,
                                       min_qual);
                    o[r.slen] = RESET;
                    my_bases += r.slen;
                }
                int64_t sz = (int64_t)lb.size();
                if (sz >= TL)
                    kssd::sketch_span(lb.data(), sz, 0, sz - TL + 1,
                                      cfg, scratch, out);
            }
#ifdef _OPENMP
#pragma omp atomic
#endif
            *n_bases += my_bases;
        }
    };

    bool done = false;
    while (!done) {
        recs.clear();
        int64_t bases = 0;
        FqChunker::ScanStatus st = c.scan(INT64_MAX, recs, &bases);
        // process before refill() — record offsets die on compaction
        process(recs);
        if (st == FqChunker::AT_EOF) {
            done = true;
        } else if (st == FqChunker::NEED_MORE && !c.refill()) {
            if (c.error()) return -1;   // bad gz: fail, don't truncate
            recs.clear();
            c.scan(INT64_MAX, recs, &bases);
            process(recs);
            done = true;
        }
    }

    int64_t total = 0;
    for (auto& p : parts) total += (int64_t)p.size();
    uint64_t* out =
        (uint64_t*)malloc(sizeof(uint64_t) * (size_t)(total ? total : 1));
    int64_t off = 0;
    for (auto& p : parts) {
        memcpy(out + off, p.data(), p.size() * sizeof(uint64_t));
        off += (int64_t)p.size();
    }
    *out_ptr = out;
    return total;
}

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

// Exact "%f" (6 decimals) of a double: glibc rounds the true binary
// value half-even at the 6th decimal, which for |v| in a safe range is
// round_half_even(m * 5^6 << (e+6)) computed exactly in 128-bit
// integers (v = m*2^e; x10^6 adds 2^6*5^6).  Out-of-range magnitudes
// and non-finite values fall back to snprintf.  Returns bytes written
// (never NUL-terminates), or 0 to request the snprintf fallback.
static int fast_f6(char* out, double v) {
    uint64_t bits;
    memcpy(&bits, &v, 8);
    int biased = (int)((bits >> 52) & 0x7FF);
    uint64_t mant = bits & ((1ULL << 52) - 1);
    if (biased == 0x7FF) return 0;                 // inf/nan
    int e;
    uint64_t m;
    if (biased == 0) {                              // subnormal
        m = mant;
        e = -1074;
    } else {
        m = mant | (1ULL << 52);
        e = biased - 1075;
    }
    // P = m * 5^6;  v*10^6 = P * 2^(e+6)
    unsigned __int128 P = (unsigned __int128)m * 15625u;
    int sh = e + 6;
    unsigned __int128 D;
    if (sh >= 0) {
        if (sh > 50) return 0;                     // huge magnitude
        D = P << sh;
    } else {
        int s = -sh;
        if (s > 120) {
            D = 0;                                 // rounds to 0.000000
        } else {
            unsigned __int128 I = P >> s;
            unsigned __int128 frac = P - (I << s);
            unsigned __int128 half = (unsigned __int128)1 << (s - 1);
            D = I + (frac > half || (frac == half && (I & 1)));
        }
    }
    if (D > (unsigned __int128)9000000000000000000ULL) return 0;
    uint64_t d = (uint64_t)D;
    char* p = out;
    if (bits >> 63) *p++ = '-';
    uint64_t ip = d / 1000000u, fp = d % 1000000u;
    char tmp[20];
    int n = 0;
    do {
        tmp[n++] = (char)('0' + ip % 10);
        ip /= 10;
    } while (ip);
    while (n) *p++ = tmp[--n];
    *p++ = '.';
    for (int i = 5; i >= 0; i--) {
        p[i] = (char)('0' + fp % 10);
        fp /= 10;
    }
    p += 6;
    return (int)(p - out);
}

// Bulk "name\tvalue\n" line formatting (glibc %f, exactly what the
// reference's printf emits, command_composite.c:322-346).  Python-side
// float formatting is the hot loop of abv_search when a query touches
// most samples; fast_f6 (exact, with snprintf fallback) is ~20x
// snprintf.  Returns bytes written, or -1 if out_cap would overflow.
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
        int w = 0;
        if (end - p >= 32) w = fast_f6(p, vals[i]);
        if (w == 0) {
            w = snprintf(p, (size_t)(end - p), "%f", vals[i]);
            // w == end-p means snprintf truncated (NUL overwrote the
            // last byte), so treat exactly-full as overflow too.
            if (w < 0 || w >= end - p) return -1;
        }
        p += w;
        if (p >= end) return -1;
        *p++ = '\n';
    }
    return p - out;
}

}  // extern "C"
