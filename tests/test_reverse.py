"""reverse verb parity: sketch -> k-mer strings."""

import os

import numpy as np
import pytest

from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import reverse, cli

from tests import oracle
from tests.util import random_seq, write_fasta

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@needs_oracle
def test_reverse_matches_oracle(tmp_path):
    rng = np.random.default_rng(0)
    g = random_seq(rng, 30000)
    gdir = tmp_path / "g"
    gdir.mkdir()
    write_fasta(str(gdir / "x.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=13))
    co = str(tmp_path / "co")
    oracle.run(["dist", "-L", shufp, "-o", co, str(gdir)])

    ref_out = tmp_path / "rev_ref"
    ref_out.mkdir()
    oracle.run(["reverse", "-L", shufp, "-o", str(ref_out), co])
    my_out = tmp_path / "rev_mine"
    reverse.co_reverse2kmer(co, shufp, str(my_out))

    ref_kmers = sorted(open(ref_out / "x.fa").read().splitlines())
    my_kmers = sorted(open(my_out / "x.fa").read().splitlines())
    assert ref_kmers == my_kmers
    assert len(ref_kmers) > 0


@needs_oracle
def test_reverse_roundtrip_resketch(tmp_path):
    """reverse output re-sketched must reproduce the original sketch."""
    rng = np.random.default_rng(5)
    g = random_seq(rng, 20000)
    gdir = tmp_path / "g"
    gdir.mkdir()
    write_fasta(str(gdir / "x.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=21))
    co = str(tmp_path / "co")
    cli.main(["dist", "-L", shufp, "-o", co, str(gdir)])
    rev_out = tmp_path / "rev"
    reverse.co_reverse2kmer(co, shufp, str(rev_out))

    # k-mer list as a fasta of short seqs -> sketch again
    kmers = open(rev_out / "x.fa").read().splitlines()
    refa = tmp_path / "kmers.fa"
    write_fasta(str(refa), kmers)
    co2 = str(tmp_path / "co2")
    cli.main(["dist", "-L", shufp, "-o", co2, str(refa)])

    from metakssd_tpu.formats.codir import CoDir
    a = CoDir.read(co, want_abund=False)
    b = CoDir.read(co2, want_abund=False)
    np.testing.assert_array_equal(np.sort(a.genome_ids(0, 0)),
                                  np.sort(b.genome_ids(0, 0)))
