"""Oracle parity across the full dist output option space.

Every option-dependent branch of dist.write_distance_out /
dist._format_line (reference dist_print_nobin + output_ctrl,
command_dist.c:1531-1674) gets a line-identical oracle check:
``-M {0,1} x -O {0,1,2} x --correction {0,1}``, the ``-N`` top-N
insertion sort (ties + zero-metric drop, command_dist.c:1592-1618),
and the ``-D`` distance threshold filter.
"""

import os

import numpy as np
import pytest

from metakssd_tpu import dist
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams

from tests import oracle
from tests.util import random_seq, write_fasta

pytestmark = pytest.mark.skipif(oracle.ensure_oracle("cs6") is None,
                                reason="no cs6 oracle")


def _mutate(rng, seq: str, rate: float) -> str:
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    idx = rng.random(arr.size) < rate
    arr[idx] = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, int(idx.sum()))]
    return arr.tobytes().decode()


@pytest.fixture(scope="module")
def art(tmp_path_factory):
    """Shared artifacts: 4-genome mco reference + 3 queries spanning
    near-identical / diverged / unrelated, so every config has a spread
    of metric values (some zero-shared rows, some near-zero dists)."""
    tmp = tmp_path_factory.mktemp("distopts")
    rng = np.random.default_rng(11)
    gdir = tmp / "genomes"
    gdir.mkdir()
    genomes = []
    for i in range(4):
        g = random_seq(rng, 30000)
        genomes.append(g)
        write_fasta(str(gdir / f"g{i}.fa"), [g])
    shufp = str(tmp / "t.shuf")
    write_shuf(shufp, make_shuf(SketchParams(k=8, subk=5, drlevel=2),
                                seed=99))
    qdir = tmp / "qry"
    qdir.mkdir()
    write_fasta(str(qdir / "q0.fa"), [genomes[0][:15000]])
    write_fasta(str(qdir / "q1.fa"), [_mutate(rng, genomes[1], 0.08)])
    write_fasta(str(qdir / "q2.fa"), [random_seq(rng, 15000)])

    co_ref = str(tmp / "co_ref")
    oracle.run(["dist", "-L", shufp, "-o", co_ref, str(gdir)],
               variant="cs6")
    mco = str(tmp / "mco_ref")
    oracle.run(["dist", "-o", mco, co_ref], variant="cs6")
    co_qry = str(tmp / "co_qry")
    oracle.run(["dist", "-L", shufp, "-o", co_qry, str(qdir)],
               variant="cs6")
    return {"tmp": tmp, "mco": mco, "qry": co_qry}


def _oracle_lines(art, tag: str, flags: list[str]) -> list[str]:
    out = str(art["tmp"] / f"o_{tag}")
    oracle.run(["dist", "-r", art["mco"], "-o", out, *flags, art["qry"]],
               variant="cs6")
    with open(os.path.join(out, "distance.out")) as f:
        return f.readlines()


def _my_lines(art, tag: str, opts: dist.DistOptions) -> list[str]:
    out = str(art["tmp"] / f"m_{tag}")
    dist.run_dist_search(art["mco"], art["qry"], out, opts)
    with open(os.path.join(out, "distance.out")) as f:
        return f.readlines()


def _assert_match(ref: list[str], mine: list[str]) -> None:
    # header must match exactly; body order-insensitively (the reference
    # emits per-query blocks in rid order — ours too — but sorting keeps
    # the assertion robust to tie order inside the -N insertion sort)
    assert ref[0] == mine[0], f"header: {ref[0]!r} != {mine[0]!r}"
    assert sorted(ref[1:]) == sorted(mine[1:])


@pytest.mark.parametrize("metric", [0, 1])
@pytest.mark.parametrize("outfields", [0, 1, 2])
@pytest.mark.parametrize("correction", [0, 1])
def test_metric_outfields_correction(art, metric, outfields, correction):
    tag = f"m{metric}o{outfields}c{correction}"
    ref = _oracle_lines(art, tag, ["-M", str(metric), "-O", str(outfields),
                                   "--correction", str(correction)])
    mine = _my_lines(art, tag, dist.DistOptions(
        metric=metric, outfields=outfields, correction=bool(correction)))
    assert len(ref) > 1, "no output lines — fixture too small"
    _assert_match(ref, mine)


@pytest.mark.parametrize("metric", [0, 1])
@pytest.mark.parametrize("topn", [1, 2])
def test_topn(art, metric, topn):
    """-N: per-query best-N by (uncorrected) metric, zero-metric refs
    dropped (command_dist.c:1592-1618)."""
    tag = f"n{topn}m{metric}"
    ref = _oracle_lines(art, tag, ["-N", str(topn), "-M", str(metric)])
    mine = _my_lines(art, tag, dist.DistOptions(
        metric=metric, num_neigb=topn))
    # 3 queries x at-most-topn lines each, and fewer than the full 12
    assert 1 < len(ref) <= 1 + 3 * topn
    _assert_match(ref, mine)


@pytest.mark.parametrize("metric", [0, 1])
def test_threshold(art, metric):
    """-D: filter lines whose dist exceeds the threshold; pick the
    median observed dist so the filter provably drops some lines and
    keeps others."""
    base = _oracle_lines(art, f"dbase{metric}", ["-M", str(metric)])
    dists = sorted(float(ln.split("\t")[4]) for ln in base[1:])
    # most unrelated pairs saturate at dist=1.0, so the median can equal
    # the max; the smallest observed dist always keeps >=1 line and
    # drops the saturated ones
    thr = dists[len(dists) // 2]
    if thr >= dists[-1]:
        thr = dists[0]
    assert thr < dists[-1], "no dist spread in fixture"
    tag = f"d{metric}"
    ref = _oracle_lines(art, tag, ["-M", str(metric), "-D", f"{thr:.6f}"])
    mine = _my_lines(art, tag, dist.DistOptions(
        metric=metric, mut_dist_max=thr))
    assert 1 < len(ref) < len(base)
    _assert_match(ref, mine)


def test_kitchen_sink(art):
    """All non-default options at once."""
    base = _oracle_lines(art, "ks_base", ["-M", "1", "--correction", "1"])
    dists = sorted(float(ln.split("\t")[4]) for ln in base[1:])
    thr = dists[(3 * len(dists)) // 4]
    ref = _oracle_lines(art, "ks", ["-M", "1", "-O", "1", "--correction",
                                    "1", "-N", "2", "-D", f"{thr:.6f}"])
    mine = _my_lines(art, "ks", dist.DistOptions(
        metric=1, outfields=1, correction=True, num_neigb=2,
        mut_dist_max=thr))
    _assert_match(ref, mine)


def test_cli_option_passthrough(art):
    """The CLI verb must thread -M/-O/-N/-D/--correction into
    DistOptions identically (cli.py:92-94)."""
    from metakssd_tpu import cli
    out = str(art["tmp"] / "m_cli")
    rc = cli.main(["dist", "-r", art["mco"], "-o", out, "-M", "1",
                   "-O", "1", "--correction", "1", "-N", "2",
                   art["qry"]])
    assert rc == 0
    ref = _oracle_lines(art, "cli", ["-M", "1", "-O", "1", "--correction",
                                     "1", "-N", "2"])
    with open(os.path.join(out, "distance.out")) as f:
        _assert_match(ref, f.readlines())
