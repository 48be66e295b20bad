"""Multi-chip shared-count matrix on real artifacts vs the serial path."""

import numpy as np
import pytest

import jax

from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import cli, dist
from metakssd_tpu.parallel import mesh as pmesh

from tests.util import random_seq, write_fasta


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_counts_match_serial(tmp_path):
    rng = np.random.default_rng(0)
    gdir = tmp_path / "g"
    gdir.mkdir()
    genomes = [random_seq(rng, 30000) for _ in range(4)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=11))
    co_ref = str(tmp_path / "co_ref")
    cli.main(["dist", "-L", shufp, "-o", co_ref, str(gdir)])
    qdir = tmp_path / "q"
    qdir.mkdir()
    write_fasta(str(qdir / "q0.fa"), [genomes[1][:15000]])
    write_fasta(str(qdir / "q1.fa"), [random_seq(rng, 12000)])
    co_qry = str(tmp_path / "co_qry")
    cli.main(["dist", "-L", shufp, "-o", co_qry, str(qdir)])

    serial = dist.shared_kmer_matrix(co_ref, co_qry, use_device=False)
    m = pmesh.make_mesh(n_data=1, n_db=8)
    sharded = pmesh.sharded_shared_counts(co_ref, co_qry, m)
    np.testing.assert_array_equal(serial, sharded)
    assert serial.max() > 0
    m1 = pmesh.make_mesh(n_data=1, n_db=1)
    one = pmesh.sharded_shared_counts(co_ref, co_qry, m1)
    np.testing.assert_array_equal(serial, one)

    # query batching over the data axis (2 data x 4 db)
    m24 = pmesh.make_mesh(n_data=2, n_db=4)
    both = pmesh.sharded_shared_counts(co_ref, co_qry, m24)
    np.testing.assert_array_equal(serial, both)

    # per-read fastq sketches carry duplicate k-mers; both paths must
    # count once per query *occurrence* (reference command_dist.c:1044-1049)
    from metakssd_tpu.formats.codir import CoDir, write_codir
    qcd = CoDir.read(co_qry, want_abund=False)
    dup = [[(np.sort(np.concatenate([qcd.genome_ids(c, g),
                                     qcd.genome_ids(c, g)[::3]])), None)
            for c in range(qcd.stat.comp_num)]
           for g in range(qcd.stat.infile_num)]
    co_dup = str(tmp_path / "co_dup")
    write_codir(co_dup, qcd.stat, dup)
    serial_d = dist.shared_kmer_matrix(co_ref, co_dup, use_device=False)
    sharded_d = pmesh.sharded_shared_counts(co_ref, co_dup, m)
    np.testing.assert_array_equal(serial_d, sharded_d)
    assert (serial_d != serial).any()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_composite_profile_identical(tmp_path):
    """composite --shard-db over the 8-device mesh is byte-identical to
    the serial profile."""
    import io
    from metakssd_tpu import composite
    from tests.util import write_fastq, reads_from_genome

    rng = np.random.default_rng(5)
    gdir = tmp_path / "g"
    gdir.mkdir()
    genomes = [random_seq(rng, 40000) for _ in range(6)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=17))
    db = str(tmp_path / "db")
    cli.main(["dist", "-L", shufp, "-o", db, str(gdir)])
    reads = reads_from_genome(rng, genomes[2], 1500, 90)
    fq = str(tmp_path / "q.fq")
    write_fastq(fq, reads, ["I" * len(r) for r in reads])
    qco = str(tmp_path / "qco")
    cli.main(["dist", "-L", shufp, "-A", "-o", qco, fq])

    serial, sharded, one = io.StringIO(), io.StringIO(), io.StringIO()
    composite.get_species_abundance(db, qco, out=serial)
    composite.get_species_abundance(db, qco, out=sharded, shard_db=8)
    assert serial.getvalue() == sharded.getvalue()
    assert serial.getvalue().count("\n") >= 1
    # shard_db=1: single-device staging, on-device segment-sum counts —
    # the colocated-TPU deployment shape for DBs that fit one HBM
    composite.get_species_abundance(db, qco, out=one, shard_db=1)
    assert one.getvalue() == serial.getvalue()
    # binvec (-b) rides the same match path: .abv bytes identical too
    import os
    for tag, sh in (("abv_s", 0), ("abv_p", 8)):
        composite.get_species_abundance(
            db, qco, outdir=str(tmp_path / tag), binvec=True,
            out=io.StringIO(), shard_db=sh)
    fa = os.listdir(str(tmp_path / "abv_s"))
    assert fa and fa == os.listdir(str(tmp_path / "abv_p"))
    for f in fa:
        assert open(tmp_path / "abv_s" / f, "rb").read() == \
            open(tmp_path / "abv_p" / f, "rb").read()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_stage1_sketch_identical(tmp_path):
    """dist --mesh data-parallel sketching equals the serial sketch."""
    rng = np.random.default_rng(6)
    gdir = tmp_path / "g"
    gdir.mkdir()
    for i in range(2):
        write_fasta(str(gdir / f"g{i}.fa"), [random_seq(rng, 50000)])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=19))
    a = str(tmp_path / "a")
    cli.main(["dist", "-L", shufp, "-o", a, str(gdir)])
    b = str(tmp_path / "b")
    cli.main(["dist", "-L", shufp, "--mesh", "8", "-o", b, str(gdir)])
    from metakssd_tpu.formats.codir import CoDir
    ca, cb = CoDir.read(a), CoDir.read(b)
    for g in range(2):
        np.testing.assert_array_equal(ca.genome_ids(0, g),
                                      cb.genome_ids(0, g))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_expansion_counts_long_rows_and_mult(tmp_path):
    """The matched-row-expansion dist step (db axis == 1) must match the
    serial path when posting rows are longer than SUBW (k-mers shared by
    many genomes -> subrow splitting) and queries carry duplicate k-mers
    (multiplicity weighting)."""
    from metakssd_tpu.formats.codir import CoDir, write_codir
    from metakssd_tpu.formats.costat import CoStat
    from metakssd_tpu.ops.profile_device import SUBW

    rng = np.random.default_rng(3)
    nref = 40
    # a core of shared k-mers present in EVERY genome (row len 40 > SUBW)
    core = np.unique(rng.integers(0, 1 << 30, 50).astype(np.uint32))
    per_genome = []
    for i in range(nref):
        own = rng.integers(0, 1 << 30, 300).astype(np.uint32)
        per_genome.append([(np.unique(np.concatenate([core, own])), None)])
    ctx = np.array([g[0][0].size for g in per_genome], np.uint32)
    stat = CoStat(7, False, 16, 4, 1, int(ctx.sum()), ctx,
                  [f"g{i}" for i in range(nref)])
    refdir = str(tmp_path / "ref")
    write_codir(refdir, stat, per_genome)
    assert core.size and nref > SUBW

    # queries with duplicates (per-read sketches)
    per_q = []
    for i in range(3):
        hits = rng.choice(per_genome[i][0][0], 120)
        miss = rng.integers(0, 1 << 30, 80).astype(np.uint32)
        ids = np.sort(np.concatenate([hits, hits[::2], core, miss]))
        per_q.append([(ids.astype(np.uint32), None)])
    qctx = np.array([g[0][0].size for g in per_q], np.uint32)
    qstat = CoStat(7, False, 16, 4, 1, int(qctx.sum()), qctx,
                   [f"q{i}" for i in range(3)])
    qrydir = str(tmp_path / "qry")
    write_codir(qrydir, qstat, per_q)

    serial = dist.shared_kmer_matrix(refdir, qrydir, use_device=False)
    for n_data in (1, 8):
        m = pmesh.make_mesh(n_data=n_data, n_db=1)
        got = pmesh.sharded_shared_counts(refdir, qrydir, m)
        np.testing.assert_array_equal(serial, got), n_data
    assert serial.min() >= core.size  # every (q, ref) shares the core
