"""Integrated e2e profiling driver: one flow, oracle-checked stages.

profile_fastq composes the reference README.md:42-51 three-command
workflow (dist -A / composite / possion.kssd2out.pl) into one timed
pipeline; these tests assert the fused flow's artifacts are identical
to the stepwise ones (and to the oracle's composite output consuming
our sketch), and that the per-stage budget is reported.
"""

import io
import json
import os

import numpy as np
import pytest

from metakssd_tpu import composite, profile_e2e
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu.postprocess import poisson

from tests import oracle
from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@pytest.fixture(scope="module")
def e2e_setup(tmp_path_factory):
    """Oracle-built MarkerDB (3 species) + one fastq read sample."""
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(4)
    gdir = tmp / "genomes"
    gdir.mkdir()
    genomes = [random_seq(rng, 40000) for _ in range(3)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"sp{i}.fa"), [g])
    shufp = str(tmp / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=21))
    refco = str(tmp / "refco")
    oracle.run(["dist", "-L", shufp, "-o", refco, str(gdir)])
    fq = str(tmp / "sample.fq")
    reads = (reads_from_genome(rng, genomes[0], 2500, 100)
             + reads_from_genome(rng, genomes[2], 500, 100))
    write_fastq(fq, reads)
    return tmp, shufp, refco, fq


@needs_oracle
def test_profile_fastq_stages_and_parity(e2e_setup):
    tmp, shufp, refco, fq = e2e_setup
    out = str(tmp / "prof")
    rep = profile_e2e.profile_fastq([fq], refco, shufp, out)

    # per-stage budget: the three top-level stages all measured
    for st in ("e2e.sketch", "e2e.profile", "e2e.poisson"):
        assert st in rep["stages"], rep["stages"]
    assert rep["total_s"] >= sum(
        rep["stages"][s] for s in ("e2e.sketch", "e2e.profile",
                                   "e2e.poisson")) - 1e-3

    # coverage tsv == the oracle's composite output consuming OUR sketch
    r = oracle.run(["composite", "-r", refco, "-q",
                    rep["artifacts"]["sketch"]])
    ref_lines = [ln for ln in r.stdout.splitlines() if ln.count("\t") == 6]
    with open(rep["artifacts"]["coverage_tsv"]) as f:
        my_lines = f.read().splitlines()
    assert my_lines == ref_lines
    assert len(my_lines) >= 2  # both spiked species present

    # abundance.tsv == stepwise poisson over the same tsv
    buf = io.StringIO()
    with open(rep["artifacts"]["coverage_tsv"]) as f:
        poisson.poisson_abundance(f, shkm_thr=6, out=buf)
    with open(rep["artifacts"]["abundance_tsv"]) as f:
        assert f.read() == buf.getvalue()
    # the deep-coverage species dominates the profile
    rows = [ln.split("\t") for ln in buf.getvalue().splitlines()]
    abund = {r[1]: float(r[2]) for r in rows}
    assert max(abund.values()) == abund[max(abund,
                                            key=lambda k: abund[k])]
    assert any("sp0" in k for k in abund)


@needs_oracle
def test_profile_sharded_matches_serial(e2e_setup):
    """--mesh/--shard-db through the one-command flow: identical
    artifacts on the virtual CPU mesh."""
    tmp, shufp, refco, fq = e2e_setup
    from metakssd_tpu import pipeline
    out = str(tmp / "prof_sh")
    rep = profile_e2e.profile_fastq(
        [fq], refco, shufp, out,
        opts=pipeline.SketchOptions(abundance=True, mesh=2), shard_db=2)
    # self-contained serial baseline (no ordering dependency on the
    # other tests in this module)
    serial = str(tmp / "prof_sh_serial")
    rep_s = profile_e2e.profile_fastq([fq], refco, shufp, serial)
    with open(rep["artifacts"]["abundance_tsv"]) as a, \
            open(rep_s["artifacts"]["abundance_tsv"]) as b:
        assert a.read() == b.read()


@needs_oracle
def test_profile_cli(e2e_setup, capsys):
    from metakssd_tpu import cli
    tmp, shufp, refco, fq = e2e_setup
    out = str(tmp / "prof_cli")
    rc = cli.main(["profile", "-L", shufp, "-r", refco, "-o", out, fq])
    assert rc == 0
    rep = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert "e2e.sketch" in rep["stages"]
    for art in ("species_coverage.tsv", "abundance.tsv"):
        assert os.path.getsize(os.path.join(out, art)) > 0
    # CLI flow output identical to the library flow
    with open(os.path.join(out, "abundance.tsv")) as a, \
            open(str(tmp / "prof" / "abundance.tsv")) as b:
        assert a.read() == b.read()
