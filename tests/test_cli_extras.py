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


def test_keepcofile_and_parse_pool(tmp_path):
    """--keepcofile writes the reference's {i}.co.{c} intermediates and
    -p parses in a thread pool without changing the combined output."""
    import numpy as np
    from metakssd_tpu import cli
    from metakssd_tpu.formats.codir import CoDir
    from metakssd_tpu.formats.shuf import make_shuf, write_shuf
    from metakssd_tpu.params import SketchParams
    from tests.util import random_seq, write_fasta

    rng = np.random.default_rng(3)
    gdir = tmp_path / "g"
    gdir.mkdir()
    for i in range(3):
        write_fasta(str(gdir / f"g{i}.fa"), [random_seq(rng, 20000)])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=5))
    out1 = str(tmp_path / "co1")
    cli.main(["dist", "-L", shufp, "-o", out1, str(gdir)])
    out2 = str(tmp_path / "co2")
    cli.main(["dist", "-L", shufp, "-p", "3", "--keepcofile", "-o", out2,
              str(gdir)])
    a, b = CoDir.read(out1), CoDir.read(out2)
    for g in range(3):
        np.testing.assert_array_equal(a.genome_ids(0, g),
                                      b.genome_ids(0, g))
        per_file = np.fromfile(str(tmp_path / "co2" / f"{g}.co.0"),
                               dtype=np.uint32)
        np.testing.assert_array_equal(np.sort(per_file),
                                      np.sort(b.genome_ids(0, g)))


def test_byread_wide_config(tmp_path):
    """--byread on a k-drlevel>8 config uses the golden stream-order
    fallback (used to raise NotImplementedError)."""
    import numpy as np
    from metakssd_tpu import cli
    from metakssd_tpu.formats.shuf import make_shuf, write_shuf
    from metakssd_tpu.params import SketchParams
    from metakssd_tpu.ops import golden
    from tests.util import random_seq, write_fasta

    rng = np.random.default_rng(9)
    fa = str(tmp_path / "g.fa")
    seqs = [random_seq(rng, 4000), random_seq(rng, 3000)]
    write_fasta(fa, seqs)
    shufp = str(tmp_path / "w.shuf")
    shuf = make_shuf(SketchParams(k=12, subk=6, drlevel=2), seed=2)
    assert shuf.params.k - shuf.params.drlevel > 8
    write_shuf(shufp, shuf)
    out = str(tmp_path / "br")
    cli.main(["dist", "-L", shufp, "--byread", "-o", out, fa])
    idx = np.fromfile(f"{out}/combco.index.0", dtype=np.uint64)
    assert idx.size == len(seqs) + 1
    total = sum(
        np.fromfile(f"{out}/combco.{c}", dtype=np.uint32).size
        for c in range(shuf.params.component_num))
    from metakssd_tpu.io import seqio
    codes = seqio.fasta_to_codes(fa)
    assert total == golden.window_drtuples(codes, shuf).size


def test_dist_m_memmap_matches(tmp_path):
    """-m small enough to force the memory-mapped matrix path yields an
    identical distance.out."""
    import numpy as np
    from metakssd_tpu import cli
    from metakssd_tpu.formats.shuf import make_shuf, write_shuf
    from metakssd_tpu.params import SketchParams
    from tests.util import random_seq, write_fasta

    rng = np.random.default_rng(12)
    gdir = tmp_path / "g"
    gdir.mkdir()
    gs = [random_seq(rng, 30000) for _ in range(3)]
    for i, g in enumerate(gs):
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=7))
    co = str(tmp_path / "co")
    cli.main(["dist", "-L", shufp, "-o", co, str(gdir)])
    qco = str(tmp_path / "qco")
    qdir = tmp_path / "q"
    qdir.mkdir()
    write_fasta(str(qdir / "q.fa"), [gs[0][:9000]])
    cli.main(["dist", "-L", shufp, "-o", qco, str(qdir)])
    d1 = str(tmp_path / "d1")
    cli.main(["dist", "-r", co, "-o", d1, qco])
    d2 = str(tmp_path / "d2")
    cli.main(["dist", "-r", co, "-m", "1e-9", "-o", d2, qco])
    assert open(f"{d1}/distance.out").read() == \
        open(f"{d2}/distance.out").read()


def test_shuffle_usedefault(tmp_path, capsys):
    """--usedefault forces k=8/s=5/l=2 and announces it
    (command_shuffle.c:31,94)."""
    out = str(tmp_path / "d")
    rc = cli.main(["shuffle", "--usedefault", "-k", "9", "-s", "6",
                   "-l", "3", "-o", out, "--seed", "4"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "use default values for all options" in text
    from metakssd_tpu.formats.shuf import read_shuf
    p = read_shuf(out + ".shuf").params
    assert (p.k, p.subk, p.drlevel) == (8, 5, 2)


def test_cli_friendly_shuf_mismatch(tmp_path, capsys):
    """Incompatible shuf ids print the reference-style one-liner, not a
    traceback (command_dist.c:163-167)."""
    rng = np.random.default_rng(21)
    gdir = tmp_path / "g"
    gdir.mkdir()
    from tests.util import write_fasta
    write_fasta(str(gdir / "g.fa"), [random_seq(rng, 20000)])
    sa, sb = str(tmp_path / "a.shuf"), str(tmp_path / "b.shuf")
    write_shuf(sa, make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=1))
    write_shuf(sb, make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=2))
    co_a, co_b = str(tmp_path / "a"), str(tmp_path / "b")
    cli.main(["dist", "-L", sa, "-o", co_a, str(gdir)])
    cli.main(["dist", "-L", sb, "-o", co_b, str(gdir)])
    rc = cli.main(["dist", "-r", co_a, "-o", str(tmp_path / "d"), co_b])
    assert rc == 1
    err = capsys.readouterr().err
    assert "not match ref shuf_id" in err
    assert "Traceback" not in err


def test_dist_sketch_then_search(tmp_path):
    """Seq-file query + -L <.shuf> in db-search mode sketches then
    searches in one run — the branch the reference declares but left
    empty (command_dist.c:180-182)."""
    import os
    rng = np.random.default_rng(31)
    gdir = tmp_path / "g"
    gdir.mkdir()
    from tests.util import write_fasta
    gs = [random_seq(rng, 30000) for _ in range(2)]
    for i, g in enumerate(gs):
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=11))
    co = str(tmp_path / "co")
    cli.main(["dist", "-L", shufp, "-o", co, str(gdir)])
    qfa = str(tmp_path / "q.fa")
    write_fasta(qfa, [gs[0][:12000]])
    # two-step baseline
    qco = str(tmp_path / "qco")
    cli.main(["dist", "-L", shufp, "-o", qco, qfa])
    d_ref = str(tmp_path / "dref")
    cli.main(["dist", "-r", co, "-o", d_ref, qco])
    # one-shot sketch-and-search
    d_one = str(tmp_path / "done")
    rc = cli.main(["dist", "-L", shufp, "-r", co, "-o", d_one, qfa])
    assert rc == 0
    assert open(f"{d_one}/distance.out").read() == \
        open(f"{d_ref}/distance.out").read()
    assert not os.path.exists(os.path.join(d_one, "qry.co"))
