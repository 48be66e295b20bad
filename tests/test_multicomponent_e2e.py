"""Multi-component end-to-end: stage I + stage II + dist search with the
COMPONENT_SZ=6 oracle (k=10,l=3 -> 16 components)."""

import os

import numpy as np
import pytest

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import cli, dist

from tests import oracle
from tests.util import random_seq, write_fasta

needs_cs6 = pytest.mark.skipif(oracle.ensure_oracle("cs6") is None,
                               reason="no cs6 oracle")


@needs_cs6
def test_multicomponent_dist_chain(tmp_path):
    rng = np.random.default_rng(0)
    gdir = tmp_path / "g"
    gdir.mkdir()
    genomes = [random_seq(rng, 2_000_000) for _ in range(3)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=10, subk=6, drlevel=3),
                                seed=23))

    co_ref = str(tmp_path / "co_ref")
    oracle.run(["dist", "-L", shufp, "-o", co_ref, str(gdir)],
               variant="cs6")
    ref = CoDir.read(co_ref, want_abund=False)
    assert ref.stat.comp_num == 16

    # our stage I with matching component_sz
    co_mine = str(tmp_path / "co_mine")
    cli.main(["dist", "-L", shufp, "--component_sz", "6",
              "-o", co_mine, str(gdir)])
    mine = CoDir.read(co_mine, want_abund=False)
    assert mine.stat.comp_num == 16
    by_ref = {os.path.basename(n): g for g, n in enumerate(ref.stat.names)}
    by_my = {os.path.basename(n): g for g, n in enumerate(mine.stat.names)}
    for name, rg in by_ref.items():
        for c in range(16):
            np.testing.assert_array_equal(
                np.sort(ref.genome_ids(c, rg)),
                np.sort(mine.genome_ids(c, by_my[name])),
                err_msg=f"{name} comp {c}")

    # stage II + search over all 16 components.  NOTE: the reference's
    # own multi-component stage II double-frees (co2mco.c:79 frees row
    # pointers left dangling from the previous component's loop), so the
    # oracle cannot produce a golden mco here; we check our mco round
    # trip is self-consistent instead (docs/PARITY.md).
    mco_mine = str(tmp_path / "mco_mine")
    from metakssd_tpu.formats import mco as mco_fmt
    mco_fmt.build_mco(co_mine, mco_mine, component_sz=6)
    qdir = tmp_path / "q"
    qdir.mkdir()
    write_fasta(str(qdir / "q.fa"), [genomes[0][:1_000_000]])
    co_qry = str(tmp_path / "co_qry")
    oracle.run(["dist", "-L", shufp, "-o", co_qry, str(qdir)],
               variant="cs6")
    m_direct = dist.shared_kmer_matrix(co_mine, co_qry)
    m_mco = dist.shared_kmer_matrix(mco_mine, co_qry)
    np.testing.assert_array_equal(m_direct, m_mco)
    assert m_direct.max() > 100   # query overlaps genome 0 heavily
