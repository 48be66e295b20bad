"""Extra integration coverage: query merging; composite through the
pallas merge kernel (interpret)."""

import io
import os

import numpy as np
import pytest

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.costat import CoStat
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import cli, composite, setops
from metakssd_tpu.ops import merge as merge_ops

from tests import oracle
from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@needs_oracle
def test_combine_queries_matches_manual(tmp_path):
    """dist with multiple sketch dirs merges them genome-wise."""
    rng = np.random.default_rng(0)
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=4))
    dirs = []
    for i in range(2):
        gdir = tmp_path / f"g{i}"
        gdir.mkdir()
        for j in range(2):
            write_fasta(str(gdir / f"x{i}{j}.fa"), [random_seq(rng, 8000)])
        co = str(tmp_path / f"co{i}")
        cli.main(["dist", "-L", shufp, "-o", co, str(gdir)])
        dirs.append(co)
    merged = str(tmp_path / "merged")
    cli.main(["dist", "-o", merged, *dirs])
    m = CoDir.read(merged, want_abund=False)
    assert m.stat.infile_num == 4
    a = CoDir.read(dirs[0], want_abund=False)
    b = CoDir.read(dirs[1], want_abund=False)
    np.testing.assert_array_equal(m.genome_ids(0, 0), a.genome_ids(0, 0))
    np.testing.assert_array_equal(m.genome_ids(0, 3), b.genome_ids(0, 1))
    assert m.stat.all_ctx_ct == int(m.stat.ctx_ct.sum())


@needs_oracle
def test_composite_through_pallas_merge(tmp_path, monkeypatch):
    """Profiling must be identical when matching runs through the
    pallas merge kernel (interpret mode)."""
    rng = np.random.default_rng(1)
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    # big enough that the ref component has > BLOCK distinct k-mers, so
    # the pallas windowed path actually engages (k=8,l=2 keeps ~1/256)
    genomes = [random_seq(rng, 400_000) for _ in range(2)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"sp{i}.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=6))
    refco = str(tmp_path / "refco")
    cli.main(["dist", "-L", shufp, "-o", refco, str(gdir)])
    fq = str(tmp_path / "s.fq")
    write_fastq(fq, reads_from_genome(rng, genomes[0], 1500, 100))
    qco = str(tmp_path / "qco")
    cli.main(["dist", "-L", shufp, "-A", "-o", qco, fq])

    buf_plain = io.StringIO()
    composite.get_species_abundance(refco, qco, out=buf_plain,
                                    use_device=False)

    orig = merge_ops.sorted_membership

    def forced(haystack, values, needles, use_pallas=None, interpret=False):
        return orig(haystack, values, needles, use_pallas=True,
                    interpret=True)

    monkeypatch.setattr(merge_ops, "sorted_membership", forced)
    buf_pallas = io.StringIO()
    composite.get_species_abundance(refco, qco, out=buf_pallas)
    assert buf_pallas.getvalue() == buf_plain.getvalue()
    assert buf_plain.getvalue().count("\n") >= 1
