"""CLI extras: pipecmd, primer, stat reporting."""

import io
import subprocess
import sys

import numpy as np
import pytest

from metakssd_tpu import cli, pipeline
from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams

from tests import oracle
from tests.util import random_seq, write_fastq, reads_from_genome


def test_primer_first_values(capsys):
    cli.main(["primer"])
    out = capsys.readouterr().out.splitlines()
    # reference primer[] values for 2^8 and 2^9 (global_basic.c:75-82)
    assert out[0] == "251"
    assert out[1] == "509"
    assert len(out) == 44


@pytest.mark.skipif(oracle.ensure_oracle() is None, reason="no oracle")
def test_pipecmd_matches_plain(tmp_path):
    """-P 'cat' on a fastq must equal sketching the file directly."""
    rng = np.random.default_rng(0)
    g = random_seq(rng, 10000)
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads_from_genome(rng, g, 400, 90))
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=3))
    cli.main(["dist", "-L", shufp, "-o", str(tmp_path / "plain"), fq])
    cli.main(["dist", "-L", shufp, "-P", "cat",
              "-o", str(tmp_path / "piped"), fq])
    a = CoDir.read(str(tmp_path / "plain"), want_abund=False)
    b = CoDir.read(str(tmp_path / "piped"), want_abund=False)
    np.testing.assert_array_equal(a.genome_ids(0, 0), b.genome_ids(0, 0))
