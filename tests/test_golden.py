"""Golden NumPy sketcher vs the reference binary (set-level parity)."""

import numpy as np
import pytest

from metakssd_tpu.params import SketchParams
from metakssd_tpu.formats.shuf import read_shuf, make_shuf, write_shuf
from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.io import seqio
from metakssd_tpu.ops import golden

from tests import oracle
from tests.util import (random_seq, write_fasta, write_fastq,
                        reads_from_genome)

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


def _mk_shuf(tmp_path, k=8, subk=5, drlevel=2, seed=7):
    shuf = make_shuf(SketchParams(k=k, subk=subk, drlevel=drlevel), seed=seed)
    path = str(tmp_path / "t.shuf")
    write_shuf(path, shuf)
    return shuf, path


@needs_oracle
@pytest.mark.parametrize("k,subk,drlevel", [(8, 5, 2), (11, 6, 3), (10, 6, 2)])
def test_fasta_sketch_parity(tmp_path, k, subk, drlevel):
    rng = np.random.default_rng(k * 100 + drlevel)
    shuf, shufp = _mk_shuf(tmp_path, k, subk, drlevel)
    seqs = [random_seq(rng, 30000, n_prob=0.002),
            random_seq(rng, 5000)]
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, seqs)
    out = str(tmp_path / "co")
    oracle.run(["dist", "-L", shufp, "-o", out, fa])
    ref = CoDir.read(out)

    codes = seqio.fasta_to_codes(fa)
    mine = golden.sketch_sets(codes, shuf, mode="set")
    assert len(mine) == ref.stat.comp_num
    for c in range(ref.stat.comp_num):
        ref_ids = np.sort(ref.genome_ids(c, 0))
        np.testing.assert_array_equal(ref_ids, mine[c][0],
                                      err_msg=f"component {c}")
    assert int(ref.stat.ctx_ct[0]) == sum(m[0].size for m in mine)


@needs_oracle
def test_fasta_uniq_dedup_parity(tmp_path):
    """-u mode keeps only multiplicity-1 k-mers."""
    rng = np.random.default_rng(3)
    shuf, shufp = _mk_shuf(tmp_path)
    core = random_seq(rng, 20000)
    seqs = [core + core[:10000] + random_seq(rng, 3000)]
    fa = str(tmp_path / "dup.fa")
    write_fasta(fa, seqs)
    out = str(tmp_path / "co_u")
    oracle.run(["dist", "-L", shufp, "-u", "-o", out, fa])
    ref = CoDir.read(out)
    codes = seqio.fasta_to_codes(fa)
    mine = golden.sketch_sets(codes, shuf, mode="uniq")
    np.testing.assert_array_equal(np.sort(ref.genome_ids(0, 0)), mine[0][0])


@needs_oracle
def test_fastq_koc_abundance_parity(tmp_path):
    """-A abundance mode: ids and per-id u16 counts must match."""
    rng = np.random.default_rng(11)
    shuf, shufp = _mk_shuf(tmp_path)
    genome = random_seq(rng, 20000)
    reads = reads_from_genome(rng, genome, 2000, read_len=100)
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    out = str(tmp_path / "koc")
    oracle.run(["dist", "-L", shufp, "-A", "-p", "1", "-o", out, fq])
    ref = CoDir.read(out)
    assert ref.stat.koc

    codes, _ = seqio.fastq_to_codes(fq)
    mine = golden.sketch_sets(codes, shuf, mode="koc")
    order = np.argsort(ref.genome_ids(0, 0), kind="stable")
    np.testing.assert_array_equal(ref.genome_ids(0, 0)[order], mine[0][0])
    np.testing.assert_array_equal(ref.genome_abund(0, 0)[order], mine[0][1])


@needs_oracle
def test_fastq_min_occurrence_parity(tmp_path):
    """fastq2co with -n 2: only k-mers seen >= 2 times survive."""
    rng = np.random.default_rng(5)
    shuf, shufp = _mk_shuf(tmp_path)
    genome = random_seq(rng, 15000)
    reads = reads_from_genome(rng, genome, 1500, read_len=80)
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)
    out = str(tmp_path / "co_n2")
    oracle.run(["dist", "-L", shufp, "-n", "2", "-o", out, fq])
    ref = CoDir.read(out)
    codes, _ = seqio.fastq_to_codes(fq)
    mine = golden.sketch_sets(codes, shuf, mode="occ", min_occ=2)
    np.testing.assert_array_equal(np.sort(ref.genome_ids(0, 0)), mine[0][0])


@needs_oracle
def test_fastq_quality_filter_parity(tmp_path):
    rng = np.random.default_rng(9)
    shuf, shufp = _mk_shuf(tmp_path)
    genome = random_seq(rng, 10000)
    reads = reads_from_genome(rng, genome, 500, read_len=100)
    quals = []
    for r in reads:
        q = rng.choice(np.frombuffer(b"!5I", dtype=np.uint8), size=len(r))
        quals.append(q.tobytes().decode())
    fq = str(tmp_path / "q.fq")
    write_fastq(fq, reads, quals)
    out = str(tmp_path / "co_q")
    Q = ord("5")
    oracle.run(["dist", "-L", shufp, "-Q", str(Q), "-o", out, fq])
    ref = CoDir.read(out)
    codes, _ = seqio.fastq_to_codes(fq, min_qual=Q)
    mine = golden.sketch_sets(codes, shuf, mode="occ", min_occ=1)
    np.testing.assert_array_equal(np.sort(ref.genome_ids(0, 0)), mine[0][0])


def test_reverse_roundtrip():
    """drtuple -> k-mer inversion must reproduce the canonical tuple."""
    rng = np.random.default_rng(2)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=1)
    codes = rng.integers(0, 4, size=5000).astype(np.uint8)
    dr = golden.window_drtuples(codes, shuf)
    uni = golden.drtuple_to_kmer(dr, shuf)
    # re-derive drtuples from the recovered unituples
    p = shuf.params
    dim_tup = (uni & np.uint64(p.domask)) >> np.uint64(2 * p.outctx)
    pf = shuf.shuffled_dim[dim_tup.astype(np.int64)].astype(np.uint64)
    outer_mask = np.uint64((1 << (2 * p.outctx)) - 1)
    dr2 = ((((uni & np.uint64(p.undomask))
             + ((uni & outer_mask) << np.uint64(4 * p.k - 4 * p.outctx)))
            >> np.uint64(4 * p.drlevel)) + pf)
    np.testing.assert_array_equal(dr, dr2)


@needs_oracle
def test_multicomponent_sketch_parity(tmp_path):
    """k=12,l=3 -> 16 components (k-dr=9 > COMPONENT_SZ=8): component
    routing and per-component ids must match the oracle."""
    rng = np.random.default_rng(12)
    shuf, shufp = _mk_shuf(tmp_path, k=12, subk=6, drlevel=3, seed=12)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, [random_seq(rng, 60000)])
    out = str(tmp_path / "co")
    oracle.run(["dist", "-L", shufp, "-o", out, fa])
    ref = CoDir.read(out)
    assert ref.stat.comp_num == 16
    codes = seqio.fasta_to_codes(fa)
    mine = golden.sketch_sets(codes, shuf, mode="set")
    total = 0
    for c in range(16):
        np.testing.assert_array_equal(np.sort(ref.genome_ids(c, 0)),
                                      mine[c][0], err_msg=f"comp {c}")
        total += mine[c][0].size
    assert total == int(ref.stat.ctx_ct[0])
