"""Doc-driven test: execute the README quickstart verbatim.

Extracts every ``python -m metakssd_tpu.cli ...`` line between the
``quickstart-begin``/``quickstart-end`` markers in README.md and runs
them in order against fixture data whose names match the commands
(genomes/, sample1.fastq, data/*.tsv).  If the README commands drift
from the CLI, this fails — the quickstart can never go stale.

Mirrors the reference README.md:33-60 workflow (MarkerDB build ->
profiling -> poisson -> CAMI -> abv indexing/search).
"""

import contextlib
import os
import re
import shlex

import numpy as np
import pytest

from tests.util import random_seq, write_fasta, write_fastq, \
    reads_from_genome

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def _quickstart_commands() -> list[str]:
    text = open(README).read()
    m = re.search(r"<!-- quickstart-begin -->(.*?)<!-- quickstart-end -->",
                  text, re.S)
    assert m, "quickstart markers missing from README.md"
    cmds = [ln.strip() for ln in m.group(1).splitlines()
            if ln.strip().startswith("python -m metakssd_tpu.cli")]
    assert len(cmds) >= 9, cmds
    return cmds


def test_readme_quickstart(tmp_path, monkeypatch, capsys):
    from metakssd_tpu import cli

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(31)
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    # L3K11 accepts ~1/4096 of windows, so genomes must be 100s of KB
    # for the profile to clear the MIN_KM_S=6 reporting threshold
    genomes = [random_seq(rng, 400_000) for _ in range(3)]
    for i, g in enumerate(genomes):
        write_fasta(str(gdir / f"sp{i}.fa"), [g])
    reads = (reads_from_genome(rng, genomes[0], 6000, 150)
             + reads_from_genome(rng, genomes[1], 2500, 150))
    write_fastq(str(tmp_path / "sample1.fastq"), reads)
    (tmp_path / "data").mkdir()
    # tiny but structurally valid taxonomy fixtures (formats of
    # data/best.gtdbr214_psid2ncbi_specid.tsv + node table)
    # psid column = the species id as it appears in the composite TSV
    # (here: the MarkerDB input path)
    (tmp_path / "data" / "psid2ncbi.tsv").write_text(
        "".join(f"genomes/sp{i}.fa\t{100 + i}\n" for i in range(3)))
    (tmp_path / "data" / "nodes.tsv").write_text(
        "1\tno rank\t1\troot\n"
        + "".join(f"{100 + i}\tspecies\t1\tSpecies_{i}\n"
                  for i in range(3)))

    for cmd in _quickstart_commands():
        parts = shlex.split(cmd)
        redirect = None
        if ">" in parts:
            gt = parts.index(">")
            redirect = parts[gt + 1]
            parts = parts[:gt]
        argv = parts[3:]   # strip "python -m metakssd_tpu.cli"
        if redirect:
            with open(redirect, "w") as f, contextlib.redirect_stdout(f):
                rc = cli.main(argv)
        else:
            rc = cli.main(argv)
        capsys.readouterr()
        assert rc == 0, f"quickstart command failed: {cmd}"

    # every artifact the quickstart promises exists and is non-trivial
    for art in ("L3K11.shuf", "markerdb/cofiles.stat",
                "sample1_sketch/cofiles.stat", "species_coverage.tsv",
                "abundance.tsv", "profile_out/abundance.tsv",
                "sample1.profile",
                "markerdb/abundance_Vec/sample1.fastq.abv",
                "markerdb/abundance_Vec.abm"):
        assert os.path.exists(art), f"missing quickstart artifact {art}"
    cov = open("species_coverage.tsv").read().splitlines()
    assert len(cov) >= 2          # both spiked species profiled
    ab = open("abundance.tsv").read()
    assert "sp0" in ab
    # the fused `profile` verb reproduces the stepwise artifacts
    assert open("profile_out/species_coverage.tsv").read() == \
        "\n".join(cov) + "\n"
