"""End-to-end pipeline + CLI parity: stage I, stage II (mco), dist search."""

import os
import subprocess
import sys

import numpy as np
import pytest

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.costat import CoStat, McoStat
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.formats import mco as mco_fmt
from metakssd_tpu.params import SketchParams
from metakssd_tpu import cli, dist

from tests import oracle
from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")
needs_cs6 = pytest.mark.skipif(oracle.ensure_oracle("cs6") is None,
                               reason="no cs6 oracle")


def _setup_genomes(tmp_path, n=4, size=20000, seed=0):
    rng = np.random.default_rng(seed)
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    genomes = []
    for i in range(n):
        g = random_seq(rng, size)
        genomes.append(g)
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=99)
    write_shuf(str(tmp_path / "t.shuf"), shuf)
    return gdir, genomes, shuf


def _ids_by_name(codir_path):
    cd = CoDir.read(codir_path, want_abund=False)
    out = {}
    for g, name in enumerate(cd.stat.names):
        base = os.path.basename(name)
        out[base] = {c: np.sort(cd.genome_ids(c, g))
                     for c in range(cd.stat.comp_num)}
    return out


@needs_oracle
def test_cli_stage1_multifile_parity(tmp_path):
    gdir, _, shuf = _setup_genomes(tmp_path)
    shufp = str(tmp_path / "t.shuf")
    oracle.run(["dist", "-L", shufp, "-o", str(tmp_path / "refco"),
                str(gdir)])
    rc = cli.main(["dist", "-L", shufp, "-o", str(tmp_path / "myco"),
                   str(gdir)])
    assert rc == 0
    ref = _ids_by_name(str(tmp_path / "refco"))
    mine = _ids_by_name(str(tmp_path / "myco"))
    assert set(ref) == set(mine)
    for name in ref:
        for c in ref[name]:
            np.testing.assert_array_equal(ref[name][c], mine[name][c],
                                          err_msg=f"{name} comp {c}")


@needs_oracle
def test_cli_stage1_abundance(tmp_path):
    rng = np.random.default_rng(1)
    genome = random_seq(rng, 20000)
    fq = str(tmp_path / "s.fq")
    write_fastq(fq, reads_from_genome(rng, genome, 1500, read_len=100))
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=5)
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, shuf)
    oracle.run(["dist", "-L", shufp, "-A", "-p", "1",
                "-o", str(tmp_path / "refco"), fq])
    cli.main(["dist", "-L", shufp, "-A", "-o", str(tmp_path / "myco"), fq])
    ref = CoDir.read(str(tmp_path / "refco"))
    mine = CoDir.read(str(tmp_path / "myco"))
    assert ref.stat.koc and mine.stat.koc
    order = np.argsort(ref.genome_ids(0, 0), kind="stable")
    np.testing.assert_array_equal(ref.genome_ids(0, 0)[order],
                                  mine.genome_ids(0, 0))
    np.testing.assert_array_equal(ref.genome_abund(0, 0)[order],
                                  mine.genome_abund(0, 0))


@needs_cs6
def test_stage2_mco_content_parity(tmp_path):
    """Our mco inversion must agree with the cs6 oracle row-for-row."""
    gdir, _, shuf = _setup_genomes(tmp_path, n=3)
    shufp = str(tmp_path / "t.shuf")
    co = str(tmp_path / "co")
    # sketch with the cs6 oracle (same sketches as default for k8l2)
    oracle.run(["dist", "-L", shufp, "-o", co, str(gdir)], variant="cs6")
    mco_ref = str(tmp_path / "mco_ref")
    oracle.run(["dist", "-o", mco_ref, co], variant="cs6")
    # ours from the same co dir
    mco_mine = str(tmp_path / "mco_mine")
    mco_fmt.build_mco(co, mco_mine, component_sz=6)

    for fname in ("mco.0", "mco.index.0"):
        a = open(os.path.join(mco_ref, fname), "rb").read()
        b = open(os.path.join(mco_mine, fname), "rb").read()
        assert a == b, f"{fname} differs"
    ra = McoStat.read(mco_ref)
    rb = McoStat.read(mco_mine)
    assert ra.names == rb.names
    np.testing.assert_array_equal(ra.ctx_ct, rb.ctx_ct)


@needs_cs6
def test_dist_search_parity(tmp_path):
    """distance.out must match the oracle line-for-line (sorted)."""
    gdir, genomes, shuf = _setup_genomes(tmp_path, n=3, size=30000)
    shufp = str(tmp_path / "t.shuf")
    # query = mutated fragments of genome 0 + unrelated
    rng = np.random.default_rng(7)
    qdir = tmp_path / "qry"
    qdir.mkdir()
    write_fasta(str(qdir / "q0.fa"), [genomes[0][:15000]])
    write_fasta(str(qdir / "q1.fa"), [random_seq(rng, 15000)])

    co_ref = str(tmp_path / "co_ref")
    oracle.run(["dist", "-L", shufp, "-o", co_ref, str(gdir)], variant="cs6")
    mco_ref = str(tmp_path / "mco_ref")
    oracle.run(["dist", "-o", mco_ref, co_ref], variant="cs6")
    co_qry = str(tmp_path / "co_qry")
    oracle.run(["dist", "-L", shufp, "-o", co_qry, str(qdir)], variant="cs6")
    dist_ref = str(tmp_path / "dist_ref")
    oracle.run(["dist", "-r", mco_ref, "-o", dist_ref, co_qry],
               variant="cs6")

    # ours: same mco + same query sketches (cross-toolchain artifacts)
    dist_mine = str(tmp_path / "dist_mine")
    dist.run_dist_search(mco_ref, co_qry, dist_mine, dist.DistOptions())

    ref_lines = sorted(open(os.path.join(dist_ref, "distance.out")))
    my_lines = sorted(open(os.path.join(dist_mine, "distance.out")))
    assert ref_lines == my_lines


@needs_cs6
def test_dist_search_native_refdb(tmp_path):
    """Native path: search directly against a sketch dir (no dense mco)
    must give the same matrix as against the reference's mco."""
    gdir, genomes, shuf = _setup_genomes(tmp_path, n=3)
    shufp = str(tmp_path / "t.shuf")
    co_ref = str(tmp_path / "co_ref")
    oracle.run(["dist", "-L", shufp, "-o", co_ref, str(gdir)], variant="cs6")
    mco_ref = str(tmp_path / "mco_ref")
    oracle.run(["dist", "-o", mco_ref, co_ref], variant="cs6")
    qdir = tmp_path / "qry"
    qdir.mkdir()
    write_fasta(str(qdir / "q.fa"), [genomes[1][:10000]])
    co_qry = str(tmp_path / "co_qry")
    oracle.run(["dist", "-L", shufp, "-o", co_qry, str(qdir)], variant="cs6")

    m1 = dist.shared_kmer_matrix(mco_ref, co_qry)
    m2 = dist.shared_kmer_matrix(co_ref, co_qry)
    np.testing.assert_array_equal(m1, m2)
    # sanity: related genome shares most k-mers
    st = CoStat.read(co_ref)
    qst = CoStat.read(co_qry)
    assert m1[0].max() > 0


@needs_oracle
def test_byread_oracle_parity(tmp_path):
    """--byread per-read sketching matches reads2mco: identical
    per-read index and per-read id sets, plus the cofiles.stat the
    reference writes for byread dirs (command_dist.c:354-359)."""
    rng = np.random.default_rng(17)
    fa = str(tmp_path / "x.fa")
    write_fasta(fa, [random_seq(rng, 3000), random_seq(rng, 2500),
                     random_seq(rng, 60)])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=3))
    oracle.run(["dist", "-L", shufp, "--byread", "-o",
                str(tmp_path / "refbr"), fa])
    rc = cli.main(["dist", "-L", shufp, "--byread", "-o",
                   str(tmp_path / "minebr"), fa])
    assert rc == 0
    ia = np.fromfile(str(tmp_path / "refbr" / "combco.index.0"),
                     np.uint64)
    ib = np.fromfile(str(tmp_path / "minebr" / "combco.index.0"),
                     np.uint64)
    np.testing.assert_array_equal(ia, ib)
    ra = np.fromfile(str(tmp_path / "refbr" / "combco.0"), np.uint32)
    rb = np.fromfile(str(tmp_path / "minebr" / "combco.0"), np.uint32)
    for i in range(ia.size - 1):
        np.testing.assert_array_equal(
            np.sort(ra[int(ia[i]):int(ia[i + 1])]),
            np.sort(rb[int(ib[i]):int(ib[i + 1])]), err_msg=f"read {i}")
    sa = CoStat.read(str(tmp_path / "refbr"))
    sb = CoStat.read(str(tmp_path / "minebr"))
    assert (sa.shuf_id, sa.koc, sa.kmerlen, sa.dim_rd_len, sa.comp_num,
            sa.all_ctx_ct) == \
        (sb.shuf_id, sb.koc, sb.kmerlen, sb.dim_rd_len, sb.comp_num,
         sb.all_ctx_ct)
    np.testing.assert_array_equal(sa.ctx_ct, sb.ctx_ct)
