"""Full MarkerDB build chain parity (reference README.md section 5):
dist -> set -g (species pan-sketches) -> set -q (uniq union) ->
set -i (species-specific markers) -> composite profiling."""

import io
import os

import numpy as np
import pytest

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.costat import CoStat
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import cli, composite

from tests import oracle
from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@needs_oracle
def test_full_markerdb_chain_parity(tmp_path):
    rng = np.random.default_rng(0)
    # 3 species, 2 genomes each (within-species genomes share sequence)
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    species = [random_seq(rng, 30000) for _ in range(3)]
    names = []
    for s, base in enumerate(species):
        for v in range(2):
            g = base[:20000] + random_seq(rng, 10000)
            name = f"sp{s}_v{v}.fa"
            write_fasta(str(gdir / name), [g])
            names.append(name)
    shufp = str(tmp_path / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=55))

    def build(tool, prefix):
        sk = str(tmp_path / f"{prefix}_sketch")
        pan = str(tmp_path / f"{prefix}_pan")
        uq = str(tmp_path / f"{prefix}_uniq")
        db = str(tmp_path / f"{prefix}_markerdb")
        if tool == "oracle":
            oracle.run(["dist", "-L", shufp, "-o", sk, str(gdir)])
        else:
            cli.main(["dist", "-L", shufp, "-o", sk, str(gdir)])
        # grouping file must follow the sketch's genome order
        st = CoStat.read(sk)
        taxf = str(tmp_path / f"{prefix}_grp.tsv")
        with open(taxf, "w") as f:
            for n in st.names:
                s = os.path.basename(n).split("_")[0][2:]
                f.write(f"{int(s) + 1}\tspecies_{s}\n")
        run = oracle.run if tool == "oracle" else \
            (lambda a: cli.main(a))
        run(["set", "-g", taxf, "-o", pan, sk])
        run(["set", "-q", "-o", uq, pan])
        run(["set", "-i", uq, "-o", db, pan])
        return db

    db_ref = build("oracle", "ref")
    db_mine = build("ours", "mine")

    a = CoDir.read(db_ref, want_abund=False)
    b = CoDir.read(db_mine, want_abund=False)
    assert CoStat.read(db_ref).names == CoStat.read(db_mine).names
    for g in range(a.stat.infile_num):
        np.testing.assert_array_equal(np.sort(a.genome_ids(0, g)),
                                      np.sort(b.genome_ids(0, g)),
                                      err_msg=f"species {g}")

    # profile a metagenome sample against BOTH markerdbs
    reads = (reads_from_genome(rng, species[0], 2000, 100)
             + reads_from_genome(rng, species[2], 500, 100))
    fq = str(tmp_path / "sample.fq")
    write_fastq(fq, reads)
    qco = str(tmp_path / "qco")
    cli.main(["dist", "-L", shufp, "-A", "-o", qco, fq])

    r = oracle.run(["composite", "-r", db_ref, "-q", qco])
    ref_lines = sorted(ln for ln in r.stdout.splitlines()
                       if ln.count("\t") == 6)
    buf = io.StringIO()
    composite.get_species_abundance(db_mine, qco, out=buf)
    my_lines = sorted(buf.getvalue().splitlines())
    assert my_lines == ref_lines
    assert len(my_lines) >= 2  # both spiked species detected
