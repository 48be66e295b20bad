"""Native C++ parser vs the NumPy reference parser."""

import gzip
import os

import numpy as np
import pytest

from metakssd_tpu.io import native, seqio
from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native parser unavailable")


def _py_fasta(path):
    os.environ["MKSSD_NO_NATIVE"] = "1"
    native._tried, native._lib = True, None
    try:
        return seqio.fasta_to_codes(path, return_headers=True)
    finally:
        del os.environ["MKSSD_NO_NATIVE"]
        native._tried = False


def _py_fastq(path, q=0):
    os.environ["MKSSD_NO_NATIVE"] = "1"
    native._tried, native._lib = True, None
    try:
        return seqio.fastq_to_codes(path, min_qual=q)
    finally:
        del os.environ["MKSSD_NO_NATIVE"]
        native._tried = False


@needs_native
def test_native_fasta_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    fa = str(tmp_path / "x.fa")
    write_fasta(fa, [random_seq(rng, 5000, n_prob=0.01),
                     random_seq(rng, 3333)])
    nc, nh = native.parse_fasta(fa)
    pc, ph = _py_fasta(fa)
    np.testing.assert_array_equal(nc, pc)
    np.testing.assert_array_equal(nh, ph)


@needs_native
def test_native_fasta_gz(tmp_path):
    rng = np.random.default_rng(1)
    fa = str(tmp_path / "x.fa")
    write_fasta(fa, [random_seq(rng, 4000)])
    gz = fa + ".gz"
    with gzip.open(gz, "wb") as f:
        f.write(open(fa, "rb").read())
    nc, _ = native.parse_fasta(gz)
    pc, _ = _py_fasta(fa)
    np.testing.assert_array_equal(nc, pc)


@needs_native
def test_native_fastq_matches_python(tmp_path):
    rng = np.random.default_rng(2)
    g = random_seq(rng, 8000)
    reads = reads_from_genome(rng, g, 300, 90)
    quals = ["".join(chr(int(q)) for q in rng.integers(33, 74, len(r)))
             for r in reads]
    fq = str(tmp_path / "x.fq")
    write_fastq(fq, reads, quals)
    for q in (0, 53):
        nc, ns = native.parse_fastq(fq, q)
        pc, ps = _py_fastq(fq, q)
        np.testing.assert_array_equal(nc, pc, err_msg=f"q={q}")
        np.testing.assert_array_equal(ns, ps, err_msg=f"q={q}")


@needs_native
def test_streaming_fastq_sketch_identical(tmp_path, monkeypatch):
    """MKSSD_STREAM=1 (bounded-memory batch ingestion) produces the
    identical sketch to whole-file parsing, for koc and occ modes."""
    from metakssd_tpu import pipeline
    from metakssd_tpu.formats.shuf import make_shuf
    from metakssd_tpu.params import SketchParams
    from tests.util import random_seq, write_fastq, reads_from_genome

    rng = np.random.default_rng(4)
    g = random_seq(rng, 60000)
    reads = reads_from_genome(rng, g, 2000, 90)
    quals = ["".join(chr(int(q)) for q in rng.integers(33, 74, len(r)))
             for r in reads]
    fq = str(tmp_path / "s.fq")
    write_fastq(fq, reads, quals)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=6)
    monkeypatch.setattr(pipeline, "STREAM_BATCH_BASES", 30000)

    for opts in (pipeline.SketchOptions(abundance=True),
                 pipeline.SketchOptions(min_qual=53, min_occ=2)):
        monkeypatch.delenv("MKSSD_STREAM", raising=False)
        whole = pipeline.sketch_file(fq, shuf, opts)
        monkeypatch.setenv("MKSSD_STREAM", "1")
        streamed = pipeline.sketch_file(fq, shuf, opts)
        for c in range(len(whole)):
            np.testing.assert_array_equal(whole[c][0], streamed[c][0])
            if whole[c][1] is not None:
                np.testing.assert_array_equal(whole[c][1], streamed[c][1])


@needs_native
def test_stream_gz_matches_plain_and_whole(tmp_path):
    """Chunked streaming over gz and plain input yields identical codes,
    matching the whole-file parse, including the quality-filter path and
    records with N bases / variable lengths."""
    import gzip
    rng = np.random.default_rng(5)
    fq = str(tmp_path / "x.fq")
    fqgz = fq + ".gz"
    recs = []
    for i in range(2000):
        n = int(rng.integers(50, 150))
        s = "".join("ACGTN"[b] for b in rng.integers(0, 5, n))
        q = "".join(chr(int(c)) for c in rng.integers(33, 74, n))
        recs.append(f"@r{i} hdr\n{s}\n+\n{q}\n")
    data = "".join(recs)
    with open(fq, "w") as f:
        f.write(data)
    with gzip.open(fqgz, "wt") as f:
        f.write(data)

    def collect(path, q=0):
        cs = [c.copy() for c, _ in native.stream_fastq(path, q, 20000)]
        return np.concatenate(cs)

    plain, gz = collect(fq), collect(fqgz)
    np.testing.assert_array_equal(plain, gz)
    np.testing.assert_array_equal(plain, native.parse_fastq(fq)[0])
    np.testing.assert_array_equal(collect(fq, 60), collect(fqgz, 60))


@needs_native
def test_fused_sketch_engine_edge_cases(tmp_path):
    """fastseq_sketch_file (fused parse+translate+sketch, incl. the
    AVX-512 window scan) vs golden.window_drtuples on adversarial
    inputs: reads shorter than the k-mer window, all-N reads, lowercase,
    CRLF endings, missing quality lines, quality filtering, and a k=16
    (TL=32) config that must take the scalar fallback."""
    from metakssd_tpu.formats.shuf import make_shuf
    from metakssd_tpu.ops import golden
    from metakssd_tpu.params import SketchParams

    rng = np.random.default_rng(7)

    def build_fq(path, crlf=False, drop_qual=False):
        g = random_seq(rng, 40000)
        reads = reads_from_genome(rng, g, 400, 80)
        reads += ["ACGT", "A" * 15]                  # shorter than TL
        reads += ["N" * 60, "ACGTNNNN" * 10]         # N-heavy
        reads += [reads[0].lower()]                  # lowercase
        eol = "\r\n" if crlf else "\n"
        with open(path, "w", newline="") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}{eol}{r}{eol}")
                if not drop_qual:
                    q = "".join(chr(int(x))
                                for x in rng.integers(33, 74, len(r)))
                    f.write(f"+{eol}{q}{eol}")
        return path

    for params, min_qual, crlf, drop_qual in (
            (SketchParams(k=11, subk=6, drlevel=3), 0, False, False),
            (SketchParams(k=8, subk=5, drlevel=2), 53, False, False),
            (SketchParams(k=8, subk=5, drlevel=2), 0, True, False),
            (SketchParams(k=16, subk=6, drlevel=5), 0, False, False),
            (SketchParams(k=8, subk=5, drlevel=2), 40, False, True),
            # TL=24: right at the 8-lane extraction envelope boundary
            # (m0 + 14 + 2*TL <= 64 only for some block alignments)
            (SketchParams(k=12, subk=7, drlevel=4), 0, False, False),
            (SketchParams(k=9, subk=5, drlevel=2), 0, False, False),
    ):
        shuf = make_shuf(params, seed=9)
        fq = build_fq(str(tmp_path / "e.fq"), crlf=crlf,
                      drop_qual=drop_qual)
        got = native.sketch_fastq(fq, shuf, min_qual=min_qual)
        codes, _ = _py_fastq(fq, q=min_qual)
        want = golden.window_drtuples(codes, shuf)
        np.testing.assert_array_equal(np.sort(got), np.sort(want)), params


@needs_native
def test_sharded_sketch_chunk_boundaries(tmp_path, monkeypatch):
    """The mmap-sharded fused engine (fastseq.cpp sketch_file_sharded)
    must produce the same drtuple multiset as the streaming scanner for
    every chunk decomposition: records straddling chunk ends, headers
    starting exactly at a boundary, partial tail records, no trailing
    newline, and variable read lengths."""
    from metakssd_tpu.formats.shuf import make_shuf
    from metakssd_tpu.params import SketchParams

    rng = np.random.default_rng(11)
    g = random_seq(rng, 60000)
    reads = [r[:int(n)] for r, n in zip(
        reads_from_genome(rng, g, 700, 220),
        rng.integers(30, 220, size=700))]
    fq = str(tmp_path / "b.fq")
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            q = "".join(chr(int(x)) for x in rng.integers(33, 74, len(r)))
            f.write(f"@read_{i} extra meta\n{r}\n+\n{q}\n")
        # partial tail record: header + seq only, no trailing newline
        f.write("@tail\n" + "ACGT" * 30)

    params = SketchParams(k=11, subk=6, drlevel=3)
    shuf = make_shuf(params, seed=3)
    monkeypatch.setenv("MKSSD_NO_SHARDED_SKETCH", "1")
    want = native.sketch_fastq(fq, shuf, min_qual=40)
    monkeypatch.delenv("MKSSD_NO_SHARDED_SKETCH")
    for chunk in (64, 257, 1021, 8192, 1 << 20):
        monkeypatch.setenv("MKSSD_SHARD_CHUNK", str(chunk))
        got = native.sketch_fastq(fq, shuf, min_qual=40)
        np.testing.assert_array_equal(np.sort(got), np.sort(want)), chunk
    monkeypatch.delenv("MKSSD_SHARD_CHUNK")


def _bgzf_compress(data: bytes, blocksize: int = 4000) -> bytes:
    """Minimal bgzip-format writer (gzip members with the BC FEXTRA
    subfield + empty EOF member) for testing the parallel inflate path."""
    import struct
    import zlib
    out = []
    chunks = [data[i:i + blocksize]
              for i in range(0, len(data), blocksize)] + [b""]
    for chunk in chunks:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cd = co.compress(chunk) + co.flush()
        bsize = 18 + len(cd) + 8
        hdr = struct.pack("<BBBBIBBHBBHH", 0x1f, 0x8b, 8, 4, 0, 0, 0xff,
                          6, ord("B"), ord("C"), 2, bsize - 1)
        out.append(hdr + cd + struct.pack(
            "<II", zlib.crc32(chunk), len(chunk) & 0xFFFFFFFF))
    return b"".join(out)


@needs_native
def test_bgzf_parallel_inflate_parity(tmp_path, monkeypatch):
    """BGZF inputs take the parallel member-inflate path (fastseq.cpp
    Source/bgzf_work); output must match the serial zlib path and the
    plain-file path exactly."""
    from metakssd_tpu.formats.shuf import make_shuf
    from metakssd_tpu.params import SketchParams

    rng = np.random.default_rng(13)
    g = random_seq(rng, 50000)
    reads = reads_from_genome(rng, g, 2000, 120)
    plain = b""
    for i, r in enumerate(reads):
        q = "".join(chr(int(x)) for x in rng.integers(33, 74, len(r)))
        plain += f"@r{i}\n{r}\n+\n{q}\n".encode()
    fq = str(tmp_path / "p.fq")
    bg = str(tmp_path / "p.fq.gz")
    with open(fq, "wb") as f:
        f.write(plain)
    with open(bg, "wb") as f:
        f.write(_bgzf_compress(plain))

    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=5)
    want = native.sketch_fastq(fq, shuf, min_qual=40)
    got_par = native.sketch_fastq(bg, shuf, min_qual=40)
    monkeypatch.setenv("MKSSD_NO_BGZF", "1")
    got_ser = native.sketch_fastq(bg, shuf, min_qual=40)
    monkeypatch.delenv("MKSSD_NO_BGZF")
    np.testing.assert_array_equal(np.sort(got_par), np.sort(want))
    np.testing.assert_array_equal(np.sort(got_ser), np.sort(want))


@needs_native
def test_bgzf_small_file_eof_member(tmp_path):
    """A bgzip file with few members (<= ring size) maps the zero-length
    EOF member onto a NEVER-used ring slot, whose empty buffer used to
    give zlib a NULL next_out -> silent empty sketch (advisor r3 high).
    Cover 1..4 data blocks + EOF member."""
    from metakssd_tpu.formats.shuf import make_shuf
    from metakssd_tpu.params import SketchParams

    rng = np.random.default_rng(23)
    g = random_seq(rng, 9000)
    reads = reads_from_genome(rng, g, 60, 120)
    plain = b""
    for i, r in enumerate(reads):
        plain += f"@r{i}\n{r}\n+\n{'I' * len(r)}\n".encode()
    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=5)
    fq = str(tmp_path / "s.fq")
    with open(fq, "wb") as f:
        f.write(plain)
    want = native.sketch_fastq(fq, shuf)
    assert want.size > 0
    for nblocks in (1, 2, 4):
        bg = str(tmp_path / f"s{nblocks}.fq.gz")
        with open(bg, "wb") as f:
            f.write(_bgzf_compress(plain, -(-len(plain) // nblocks)))
        got = native.sketch_fastq(bg, shuf)
        np.testing.assert_array_equal(np.sort(got), np.sort(want))


@needs_native
def test_bgzf_corrupt_member_raises(tmp_path):
    """A corrupt BGZF member must raise, not silently truncate the
    input (advisor r3 medium: nread<0 was treated as clean EOF)."""
    from metakssd_tpu.formats.shuf import make_shuf
    from metakssd_tpu.params import SketchParams

    rng = np.random.default_rng(29)
    g = random_seq(rng, 30000)
    reads = reads_from_genome(rng, g, 800, 120)
    plain = b""
    for i, r in enumerate(reads):
        plain += f"@r{i}\n{r}\n+\n{'I' * len(r)}\n".encode()
    data = bytearray(_bgzf_compress(plain, 1500))
    # corrupt a mid-file member deterministically: walk the BC chain to
    # the 3rd member and flip its stored isize (inflate then sees
    # got != isize and must report an error, not truncate)
    off = 0
    for _ in range(2):
        off += (data[off + 16] | (data[off + 17] << 8)) + 1
    bsize = (data[off + 16] | (data[off + 17] << 8)) + 1
    data[off + bsize - 4] ^= 0xFF
    bg = str(tmp_path / "c.fq.gz")
    with open(bg, "wb") as f:
        f.write(bytes(data))
    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=5)
    import pytest
    with pytest.raises(OSError):
        native.sketch_fastq(bg, shuf)


@needs_native
def test_fast_f6_formatter_matches_printf():
    """format_name_float_lines' fixed-6 formatter (fast_f6) must be
    correctly-rounded %f: exact half-even at the 6th decimal, negative
    zero, subnormals, and the big-magnitude snprintf fallback."""
    rng = np.random.default_rng(1)
    vals = np.concatenate([
        rng.random(200_000) * 100,
        -rng.random(20_000) * 100,
        rng.random(20_000) * 1e-5,
        rng.random(20_000) * 1e13,
        rng.random(5_000) * 1e16,          # fallback range
        np.array([0.0, -0.0, 0.5e-6, 1.5e-6, 2.5e-6, -2.5e-6,
                  np.pi, 1e15, -1e15, 5e-7, 1.0000005]),
        np.arange(1, 2001, 2) / 2e6,       # exact .5-ULP decimal ties
    ])
    blob = b"x" * vals.size
    off = np.arange(vals.size + 1, dtype=np.int64)
    order = np.arange(vals.size, dtype=np.int32)
    buf = native.format_name_float_lines(blob, off, order,
                                         vals.astype(np.float64))
    lines = buf.split(b"\n")[:-1]
    assert len(lines) == vals.size
    for v, ln in zip(vals.tolist(), lines):
        assert ln == b"x\t" + ("%f" % v).encode(), (v, ln)


def test_native_radix_sorts_match_numpy_stable():
    """kv_radix_sort / radix_sort_u32: exact + STABLE vs numpy across
    key-width regimes (the <=16-bit single-digit degenerate pass, the
    balanced two-digit >16-bit path) and edge sizes.  Stability is
    load-bearing: genome ids must stay ascending within a k-mer row for
    reference byte-parity of the persisted inverted indexes."""
    import numpy as np
    from metakssd_tpu.io import native as native_io
    if not native_io.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(42)
    for bits, n in [(8, 100_000), (16, 100_000), (17, 100_000),
                    (28, 300_000), (32, 300_000)]:
        keys = rng.integers(0, 1 << bits, size=n,
                            dtype=np.int64).astype(np.uint32)
        vals = rng.integers(-5, 5, size=n,
                            dtype=np.int64).astype(np.int32)
        order = np.argsort(keys, kind="stable")
        k2, v2 = keys.copy(), vals.copy()
        assert native_io.kv_radix_sort(k2, v2)
        np.testing.assert_array_equal(k2, keys[order])
        np.testing.assert_array_equal(v2, vals[order])
        k3 = keys.copy()
        assert native_io.radix_sort_u32(k3)
        np.testing.assert_array_equal(k3, keys[order])
    for m in (0, 1, 2, 3):
        keys = rng.integers(0, 7, size=m, dtype=np.int64).astype(np.uint32)
        vals = np.arange(m, dtype=np.int32)
        order = np.argsort(keys, kind="stable")
        k2, v2 = keys.copy(), vals.copy()
        native_io.kv_radix_sort(k2, v2)
        np.testing.assert_array_equal(k2, keys[order])
        np.testing.assert_array_equal(v2, vals[order])
    # all-equal keys: pure stability check
    keys = np.zeros(10_000, np.uint32)
    vals = np.arange(10_000, dtype=np.int32)
    native_io.kv_radix_sort(keys, vals)
    np.testing.assert_array_equal(vals, np.arange(10_000))
    # malformed inputs fail loudly, not with memory corruption
    import pytest
    with pytest.raises(ValueError):
        native_io.kv_radix_sort(np.zeros(4, np.uint32),
                                np.zeros(3, np.int32))
    with pytest.raises(ValueError):
        native_io.radix_sort_u32(np.zeros(4, np.int64))


def test_fused_invert_postings_matches_stable_argsort():
    """invert_postings == copy + repeat + stable kv sort, across key
    widths, empty genomes, and edge sizes (the fused cold-staging path
    of stage_markerdb / InvertedIndex.from_codir)."""
    import numpy as np
    import pytest
    from metakssd_tpu.io import native as native_io
    if not native_io.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(9)
    for bits, nref in [(8, 7), (16, 1), (17, 40), (28, 300), (32, 3)]:
        lens = rng.integers(0, 50, nref)   # includes empty genomes
        gindex = np.zeros(nref + 1, np.uint64)
        np.cumsum(lens, out=gindex[1:])
        n = int(gindex[-1])
        ids = rng.integers(0, 1 << bits, n,
                           dtype=np.int64).astype(np.uint32)
        keys, vals = native_io.invert_postings(ids, gindex, nref)
        order = np.argsort(ids, kind="stable")
        np.testing.assert_array_equal(keys, ids[order])
        np.testing.assert_array_equal(
            vals, np.repeat(np.arange(nref, dtype=np.int32),
                            lens)[order])
    k, v = native_io.invert_postings(np.zeros(0, np.uint32),
                                     np.zeros(1, np.uint64), 0)
    assert k.size == 0 and v.size == 0
    with pytest.raises(ValueError):
        native_io.invert_postings(np.zeros(3, np.uint32),
                                  np.zeros(3, np.uint64), 5)
    with pytest.raises(ValueError):
        # truncated index: gindex[-1] != ids.size must fail loudly, not
        # emit out-of-range genome rows
        native_io.invert_postings(np.zeros(10, np.uint32),
                                  np.array([0, 5], np.uint64), 1)


def test_sorted_first_indices_matches_numpy():
    import numpy as np
    import pytest
    from metakssd_tpu.io import native as native_io
    from metakssd_tpu.utils import sorted_first_idx, sorted_unique_first
    if not native_io.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 1000, 1 << 18, 3_000_000):
        sk = np.sort(rng.integers(0, max(n // 3, 1) + 1, n,
                                  dtype=np.int64).astype(np.uint32))
        np.testing.assert_array_equal(native_io.sorted_first_indices(sk),
                                      sorted_unique_first(sk)[1])
        np.testing.assert_array_equal(sorted_first_idx(sk),
                                      sorted_unique_first(sk)[1])
    # all-equal and all-distinct extremes
    np.testing.assert_array_equal(
        native_io.sorted_first_indices(np.zeros(1000, np.uint32)), [0])
    np.testing.assert_array_equal(
        native_io.sorted_first_indices(np.arange(1000, dtype=np.uint32)),
        np.arange(1000))


def test_save_npy_direct_roundtrip(tmp_path):
    """O_DIRECT atomic .npy writer: np.load-compatible (incl. mmap),
    atomic (no partial file visible), all dtypes used by the staging
    sidecars."""
    import os
    import numpy as np
    from metakssd_tpu.formats.mco import save_npy_direct
    rng = np.random.default_rng(1)
    for arr in (np.zeros(0, np.uint32),
                np.arange(7, dtype=np.int64),
                rng.integers(0, 1 << 31, 1_000_003,
                             dtype=np.int64).astype(np.uint32)):
        p = str(tmp_path / "a.npy")
        save_npy_direct(p, arr)
        np.testing.assert_array_equal(np.load(p, mmap_mode="r"), arr)
        np.testing.assert_array_equal(np.load(p), arr)
        assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]


def test_async_staging_sidecars_load_back(tmp_path):
    """stage_markerdb's background persist produces sidecars that a
    fresh staging call loads (wait_staging joins the writers)."""
    import numpy as np
    from metakssd_tpu import composite
    from metakssd_tpu.formats.codir import write_codir
    from metakssd_tpu.formats.costat import CoStat
    rng = np.random.default_rng(2)
    per_genome = []
    for g in range(4):
        ids = np.unique(rng.integers(0, 1 << 20, 3000,
                                     dtype=np.int64).astype(np.uint32))
        per_genome.append([(ids, None)])
    ctx = np.array([g[0][0].size for g in per_genome], np.uint32)
    db = str(tmp_path / "db")
    write_codir(db, CoStat(7, False, 22, 6, 1, int(ctx.sum()), ctx,
                           [f"sp{i}" for i in range(4)]), per_genome)
    cold = composite.stage_markerdb(db)
    composite.wait_staging()
    composite._COMP_CACHE.clear()
    warm = composite.stage_markerdb(db)
    np.testing.assert_array_equal(np.asarray(cold[0].rk),
                                  np.asarray(warm[0].rk))
    np.testing.assert_array_equal(np.asarray(cold[0].starts),
                                  np.asarray(warm[0].starts))
    np.testing.assert_array_equal(np.asarray(cold[0].gid_sorted),
                                  np.asarray(warm[0].gid_sorted))
    assert isinstance(np.asarray(warm[0].rk).base, np.memmap) or \
        isinstance(warm[0].rk, np.memmap)  # really loaded from sidecar


def test_sorted_unique_pack_matches_two_step():
    import numpy as np
    import pytest
    from metakssd_tpu.io import native as native_io
    if not native_io.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(8)
    for n in (0, 1, 3, 100_000, 5_000_000):
        sk = np.sort(rng.integers(0, max(n // 3, 1) + 1, n,
                                  dtype=np.int64).astype(np.uint32))
        rk, idx = native_io.sorted_unique_pack(sk)
        want_idx = native_io.sorted_first_indices(sk)
        np.testing.assert_array_equal(idx, want_idx)
        np.testing.assert_array_equal(rk, sk[want_idx])
