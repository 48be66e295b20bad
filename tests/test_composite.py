"""Composite profiling / abv parity vs the oracle."""

import io
import os

import numpy as np
import pytest

from metakssd_tpu.formats.costat import CoStat
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.formats.abv import read_abv_file
from metakssd_tpu.params import SketchParams
from metakssd_tpu import composite

from tests import oracle
from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@pytest.fixture(scope="module")
def profiling_setup(tmp_path_factory):
    """MarkerDB (3 species) + 2 query read samples, sketched by oracle."""
    tmp = tmp_path_factory.mktemp("composite")
    rng = np.random.default_rng(0)
    gdir = tmp / "genomes"
    gdir.mkdir()
    genomes = [random_seq(rng, 40000) for _ in range(3)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"sp{i}.fa"), [g])
    shufp = str(tmp / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=77))
    refco = str(tmp / "refco")
    oracle.run(["dist", "-L", shufp, "-o", refco, str(gdir)])

    qdir = tmp / "reads"
    qdir.mkdir()
    # sample 0: mix of species 0 (deep) + species 1 (shallow)
    reads = (reads_from_genome(rng, genomes[0], 3000, 100)
             + reads_from_genome(rng, genomes[1], 600, 100))
    write_fastq(str(qdir / "sample0.fq"), reads)
    reads = (reads_from_genome(rng, genomes[2], 2000, 100)
             + reads_from_genome(rng, genomes[0], 400, 100))
    write_fastq(str(qdir / "sample1.fq"), reads)
    qco = {}
    for s in ("sample0", "sample1"):
        qco[s] = str(tmp / f"qco_{s}")
        oracle.run(["dist", "-L", shufp, "-A", "-p", "1", "-o", qco[s],
                    str(qdir / f"{s}.fq")])
    return tmp, refco, qco


@needs_oracle
def test_profile_tsv_parity(profiling_setup):
    tmp, refco, qco = profiling_setup
    r = oracle.run(["composite", "-r", refco, "-q", qco["sample0"]])
    ref_lines = [ln for ln in r.stdout.splitlines()
                 if ln.count("\t") == 6]
    buf = io.StringIO()
    composite.get_species_abundance(refco, qco["sample0"], out=buf)
    my_lines = buf.getvalue().splitlines()
    assert my_lines == ref_lines


@needs_oracle
def test_abv_output_parity(profiling_setup):
    tmp, refco, qco = profiling_setup
    for s in ("sample0", "sample1"):
        ref_out = str(tmp / f"abv_ref_{s}")
        os.makedirs(ref_out, exist_ok=True)
        oracle.run(["composite", "-r", refco, "-q", qco[s], "-b",
                    "-o", ref_out])
        my_out = str(tmp / f"abv_mine_{s}")
        composite.get_species_abundance(refco, qco[s], outdir=my_out,
                                        binvec=True)
        fname = f"{s}.fq.abv"
        a = open(os.path.join(ref_out, fname), "rb").read()
        b = open(os.path.join(my_out, fname), "rb").read()
        assert a == b, f"{s}: .abv differs"


@needs_oracle
def test_index_and_search_parity(profiling_setup):
    tmp, refco, qco = profiling_setup
    # place abvs into refco/abundance_Vec (default oracle location)
    oracle.run(["composite", "-r", refco, "-q", qco["sample0"], "-b"])
    oracle.run(["composite", "-r", refco, "-q", qco["sample1"], "-b"])
    oracle.run(["composite", "-r", refco, "-i"])
    # replicate the oracle's readdir enumeration order from its name file
    with open(os.path.join(refco, "abundance_Vec.name")) as f:
        order = [ln.strip() for ln in f if ln.strip()]
    ref_bytes = {}
    for suffix in ("abm", "abmi", "name", "yl2n"):
        ref_bytes[suffix] = open(
            os.path.join(refco, f"abundance_Vec.{suffix}"), "rb").read()
    composite.index_abv(refco, file_order=order)
    for suffix in ("abm", "abmi", "name", "yl2n"):
        mine = open(os.path.join(refco, f"abundance_Vec.{suffix}"),
                    "rb").read()
        assert mine == ref_bytes[suffix], f"{suffix} differs"

    # search parity for all three measures
    for mode in (0, 1, 2):
        r = oracle.run(["composite", "-r", refco, "-s", str(mode),
                        "sample0.fq.abv"])
        buf = io.StringIO()
        composite.abv_search(refco, ["sample0.fq.abv"], mode=mode, out=buf)
        assert buf.getvalue().splitlines() == [
            ln for ln in r.stdout.splitlines() if "\t" in ln or
            ln.startswith("#")]


@needs_oracle
def test_read_abv_parity(profiling_setup):
    tmp, refco, qco = profiling_setup
    path = os.path.join(refco, "abundance_Vec", "sample0.fq.abv")
    if not os.path.exists(path):
        oracle.run(["composite", "-r", refco, "-q", qco["sample0"], "-b"])
    r = oracle.run(["composite", "-d", path])
    buf = io.StringIO()
    composite.read_abv(path, out=buf)
    assert buf.getvalue().splitlines() == [
        ln for ln in r.stdout.splitlines() if "\t" in ln]


def test_dense_cosine_matches_sparse(profiling_setup):
    tmp, refco, qco = profiling_setup
    if not os.path.exists(os.path.join(refco, "abundance_Vec.abm")):
        pytest.skip("index not built (oracle unavailable)")
    from metakssd_tpu.formats.abv import AbvIndex
    idx = AbvIndex.read(refco)
    nspecies = CoStat.read(refco).infile_num
    dense = composite.DenseAbv.from_index(idx, nspecies)
    qi, qp = read_abv_file(os.path.join(refco, "abundance_Vec",
                                        "sample0.fq.abv"))
    q = np.zeros((1, nspecies), dtype=np.float32)
    q[0, qi] = qp
    scores, ids = composite.abv_search_batch_cosine(dense, q, top_k=2)
    # sparse path for comparison
    buf = io.StringIO()
    composite.abv_search(refco, ["sample0.fq.abv"], mode=0, out=buf)
    lines = [ln.split("\t") for ln in buf.getvalue().splitlines()[1:]]
    best_name, best_val = lines[0][0], float(lines[0][1])
    assert idx.names[ids[0, 0]] == best_name
    assert abs(float(scores[0, 0]) - best_val) < 1e-4


def test_dense_text_search_matches_sparse_all_modes(profiling_setup):
    """abv_search_dense (batched MXU path) vs abv_search (sparse,
    byte-parity-with-oracle path): same sample set, same ordering, values
    within f32-accumulation tolerance, for all three measures."""
    tmp, refco, qco = profiling_setup
    if not os.path.exists(os.path.join(refco, "abundance_Vec.abm")):
        pytest.skip("index not built (oracle unavailable)")
    queries = ["sample0.fq.abv", "sample1.fq.abv"]
    for mode in (0, 1, 2):
        sparse = io.StringIO()
        for q in queries:
            composite.abv_search(refco, [q], mode=mode, out=sparse)
        dense = io.StringIO()
        composite.abv_search_dense(refco, queries, mode=mode, out=dense)
        sp = sparse.getvalue().splitlines()
        dn = dense.getvalue().splitlines()
        assert len(sp) == len(dn)
        for a, b in zip(sp, dn):
            if a.startswith("#"):
                assert a == b
                continue
            na, va = a.split("\t")
            nb, vb = b.split("\t")
            assert na == nb, f"mode {mode}: order differs: {a} vs {b}"
            assert abs(float(va) - float(vb)) <= 2e-3 + 1e-3 * abs(
                float(va)), f"mode {mode}: {a} vs {b}"


def test_cli_dense_flag(profiling_setup, capsys):
    tmp, refco, qco = profiling_setup
    if not os.path.exists(os.path.join(refco, "abundance_Vec.abm")):
        pytest.skip("index not built (oracle unavailable)")
    from metakssd_tpu import cli
    cli.main(["composite", "-r", refco, "-s", "0", "--dense",
              "sample0.fq.abv"])
    dense_out = capsys.readouterr().out
    cli.main(["composite", "-r", refco, "-s", "0", "sample0.fq.abv"])
    sparse_out = capsys.readouterr().out
    d0 = dense_out.splitlines()[1].split("\t")[0]
    s0 = sparse_out.splitlines()[1].split("\t")[0]
    assert d0 == s0


@needs_oracle
def test_device_profile_stats_path(profiling_setup, monkeypatch):
    """The colocated-TPU profiling reduction (ops/profile_device.py:
    device membership + scatter-free segment sums + segmented sort)
    produces byte-identical TSV to the host/native stats path, including
    min_km_s=0 (zero-count genomes exercise the reference's cnt==0
    percentile quirk) and the binvec route."""
    tmp, refco, qco = profiling_setup
    for s in ("sample0", "sample1"):
        for mks in (6, 0):
            buf_host = io.StringIO()
            composite.get_species_abundance(refco, qco[s], out=buf_host,
                                            min_km_s=mks)
            monkeypatch.setenv("MKSSD_DEVICE_PROFILE", "1")
            buf_dev = io.StringIO()
            composite.get_species_abundance(refco, qco[s], out=buf_dev,
                                            min_km_s=mks)
            monkeypatch.delenv("MKSSD_DEVICE_PROFILE")
            assert buf_dev.getvalue() == buf_host.getvalue(), (s, mks)
    # binvec (.abv writer) route through the device stats
    vdir_h = str(tmp / "abv_host")
    vdir_d = str(tmp / "abv_dev")
    composite.get_species_abundance(refco, qco["sample0"], outdir=vdir_h,
                                    binvec=True)
    monkeypatch.setenv("MKSSD_DEVICE_PROFILE", "1")
    composite.get_species_abundance(refco, qco["sample0"], outdir=vdir_d,
                                    binvec=True)
    monkeypatch.delenv("MKSSD_DEVICE_PROFILE")
    for f in sorted(os.listdir(vdir_h)):
        a = open(os.path.join(vdir_h, f), "rb").read()
        b = open(os.path.join(vdir_d, f), "rb").read()
        assert a == b, f


@needs_oracle
def test_observability_json_report(profiling_setup, monkeypatch, capsys):
    """MKSSD_LOG=json emits one structured line naming every stage of a
    composite profile CLI run (VERDICT r3: observability wiring)."""
    import json
    from metakssd_tpu import cli

    tmp, refco, qco = profiling_setup
    monkeypatch.setenv("MKSSD_LOG", "json")
    rc = cli.main(["composite", "-r", refco, "-q", qco["sample0"],
                   "-o", str(tmp / "obs_out")])
    monkeypatch.delenv("MKSSD_LOG")
    assert rc == 0
    err_lines = [ln for ln in capsys.readouterr().err.splitlines()
                 if ln.startswith("{")]
    assert err_lines, "no JSON report emitted"
    rep = json.loads(err_lines[-1])
    assert rep["meta"]["command"] == "composite"
    for stage in ("composite.load", "composite.stage_markerdb",
                  "composite.profile"):
        assert stage in rep["stages"], rep["stages"]
    assert rep["counters"]["composite.queries"] == 1


@needs_oracle
def test_observability_dist_stages(profiling_setup, monkeypatch, capsys):
    """dist search runs record load / shared_counts / write stages."""
    import json
    from metakssd_tpu import cli

    tmp, refco, qco = profiling_setup
    monkeypatch.setenv("MKSSD_LOG", "json")
    rc = cli.main(["dist", "-r", refco, "-o", str(tmp / "obs_dist"),
                   qco["sample0"]])
    monkeypatch.delenv("MKSSD_LOG")
    assert rc == 0
    err_lines = [ln for ln in capsys.readouterr().err.splitlines()
                 if ln.startswith("{")]
    rep = json.loads(err_lines[-1])
    for stage in ("dist.load", "dist.shared_counts", "dist.write_output"):
        assert stage in rep["stages"], rep["stages"]
