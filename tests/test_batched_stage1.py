"""Batched multi-file stage I parity (fastq koc + mixed modes)."""

import numpy as np
import pytest

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import cli

from tests import oracle
from tests.util import random_seq, write_fastq, write_fasta, \
    reads_from_genome

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@needs_oracle
def test_multi_fastq_koc_batched_parity(tmp_path):
    rng = np.random.default_rng(0)
    qdir = tmp_path / "samples"
    qdir.mkdir()
    genomes = [random_seq(rng, 15000) for _ in range(2)]
    for i in range(2):
        write_fastq(str(qdir / f"s{i}.fq"),
                    reads_from_genome(rng, genomes[i], 800, 100))
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=17))
    oracle.run(["dist", "-L", shufp, "-A", "-p", "1",
                "-o", str(tmp_path / "refko"),
                str(qdir)])
    cli.main(["dist", "-L", shufp, "-A", "-o", str(tmp_path / "myko"),
              str(qdir)])
    ref = CoDir.read(str(tmp_path / "refko"))
    mine = CoDir.read(str(tmp_path / "myko"))
    assert ref.stat.koc and mine.stat.koc
    import os
    by_name_ref = {os.path.basename(n): g
                   for g, n in enumerate(ref.stat.names)}
    by_name_my = {os.path.basename(n): g
                  for g, n in enumerate(mine.stat.names)}
    for name in by_name_ref:
        rg, mg = by_name_ref[name], by_name_my[name]
        order = np.argsort(ref.genome_ids(0, rg), kind="stable")
        np.testing.assert_array_equal(ref.genome_ids(0, rg)[order],
                                      mine.genome_ids(0, mg))
        np.testing.assert_array_equal(ref.genome_abund(0, rg)[order],
                                      mine.genome_abund(0, mg))


@needs_oracle
def test_mixed_fasta_fastq_batched_parity(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "mix"
    d.mkdir()
    g = random_seq(rng, 20000)
    write_fasta(str(d / "a.fa"), [g])
    write_fastq(str(d / "b.fq"), reads_from_genome(rng, g, 700, 90))
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=19))
    oracle.run(["dist", "-L", shufp, "-o", str(tmp_path / "refmix"),
                str(d)])
    cli.main(["dist", "-L", shufp, "-o", str(tmp_path / "mymix"), str(d)])
    ref = CoDir.read(str(tmp_path / "refmix"), want_abund=False)
    mine = CoDir.read(str(tmp_path / "mymix"), want_abund=False)
    import os
    by_ref = {os.path.basename(n): g for g, n in enumerate(ref.stat.names)}
    by_my = {os.path.basename(n): g for g, n in enumerate(mine.stat.names)}
    for name in by_ref:
        np.testing.assert_array_equal(
            np.sort(ref.genome_ids(0, by_ref[name])),
            mine.genome_ids(0, by_my[name]), err_msg=name)
