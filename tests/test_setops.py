"""Set algebra parity vs the oracle (union/uniq/subtract/intersect/
grouping/combine)."""

import os

import numpy as np
import pytest

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.costat import CoStat
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu import setops

from tests import oracle
from tests.util import random_seq, write_fasta

needs_oracle = pytest.mark.skipif(oracle.ensure_oracle() is None,
                                  reason="no oracle")


@pytest.fixture(scope="module")
def codir(tmp_path_factory):
    """One oracle-produced sketch dir shared by the set tests; includes
    overlapping genomes so subtract/intersect/uniq are non-trivial."""
    tmp = tmp_path_factory.mktemp("setops")
    rng = np.random.default_rng(0)
    gdir = tmp / "genomes"
    gdir.mkdir()
    base = random_seq(rng, 20000)
    seqs = [base,
            base[:10000] + random_seq(rng, 10000),
            random_seq(rng, 20000),
            base[5000:15000] + random_seq(rng, 5000)]
    for i, s in enumerate(seqs):
        write_fasta(str(gdir / f"g{i}.fa"), [s])
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=31)
    shufp = str(tmp / "t.shuf")
    write_shuf(shufp, shuf)
    co = str(tmp / "co")
    oracle.run(["dist", "-L", shufp, "-o", co, str(gdir)])
    return tmp, co


@needs_oracle
def test_union_parity(codir):
    tmp, co = codir
    ref_out = str(tmp / "pan_ref")
    my_out = str(tmp / "pan_mine")
    oracle.run(["set", "-u", "-o", ref_out, co])
    setops.sketch_union(co, my_out)
    a = open(os.path.join(ref_out, "pan.0"), "rb").read()
    b = open(os.path.join(my_out, "pan.0"), "rb").read()
    assert a == b  # both ascending-sorted -> byte-identical


@needs_oracle
def test_uniq_union_parity(codir):
    tmp, co = codir
    ref_out = str(tmp / "upan_ref")
    my_out = str(tmp / "upan_mine")
    oracle.run(["set", "-q", "-o", ref_out, co])
    setops.uniq_sketch_union(co, my_out)
    a = open(os.path.join(ref_out, "uniq_pan.0"), "rb").read()
    b = open(os.path.join(my_out, "uniq_pan.0"), "rb").read()
    assert a == b


@needs_oracle
@pytest.mark.parametrize("op", ["subtract", "intersect"])
def test_operate_parity(codir, op):
    tmp, co = codir
    pan = str(tmp / "pan_ref")
    if not os.path.exists(os.path.join(pan, "pan.0")):
        oracle.run(["set", "-u", "-o", pan, co])
    # build a smaller pan from genome 0 only to make ops non-trivial:
    # use uniq_pan of the full dir instead (non-trivial subset)
    upan = str(tmp / "upan_for_op")
    oracle.run(["set", "-q", "-o", upan, co])
    flag = "-s" if op == "subtract" else "-i"
    ref_out = str(tmp / f"{op}_ref")
    my_out = str(tmp / f"{op}_mine")
    oracle.run(["set", flag, upan, "-o", ref_out, co])
    setops.sketch_operate(co, upan, my_out, intersect=(op == "intersect"))
    for f in ("combco.0", "combco.index.0"):
        a = open(os.path.join(ref_out, f), "rb").read()
        b = open(os.path.join(my_out, f), "rb").read()
        assert a == b, f"{op}: {f} differs"
    sa = CoStat.read(ref_out)
    sb = CoStat.read(my_out)
    np.testing.assert_array_equal(sa.ctx_ct, sb.ctx_ct)
    assert sa.names == sb.names


@needs_oracle
def test_grouping_parity(codir):
    tmp, co = codir
    st = CoStat.read(co)
    # two species + one taxid-0 (dropped); order by input line
    taxf = str(tmp / "tax.tsv")
    with open(taxf, "w") as f:
        tax = [(101, "Escherichia_coli"), (0, None),
               (101, "Escherichia_coli"), (202, "Bacillus_subtilis")]
        for tid, name in tax:
            f.write(f"{tid}\t{name}\n" if name else f"{tid}\n")
    ref_out = str(tmp / "grp_ref")
    my_out = str(tmp / "grp_mine")
    oracle.run(["set", "-g", taxf, "-o", ref_out, co])
    setops.grouping_genomes(co, taxf, my_out)
    sa = CoStat.read(ref_out)
    sb = CoStat.read(my_out)
    assert sa.names == sb.names          # taxon order replicated
    np.testing.assert_array_equal(sa.ctx_ct, sb.ctx_ct)
    ca = CoDir.read(ref_out, want_abund=False)
    cb = CoDir.read(my_out, want_abund=False)
    for g in range(sa.infile_num):
        np.testing.assert_array_equal(np.sort(ca.genome_ids(0, g)),
                                      cb.genome_ids(0, g))


@needs_oracle
def test_combine_pans_parity(codir):
    tmp, co = codir
    pan = str(tmp / "pan_ref")
    upan = str(tmp / "upan_for_op")
    for p, flag in ((pan, "-u"), (upan, "-q")):
        if not os.path.exists(p):
            oracle.run(["set", flag, "-o", p, co])
    ref_out = str(tmp / "cpan_ref")
    my_out = str(tmp / "cpan_mine")
    oracle.run(["set", "-c", "-o", ref_out, pan, upan])
    setops.combine_pans([pan, upan], my_out)
    for f in ("combco.0", "combco.index.0"):
        a = open(os.path.join(ref_out, f), "rb").read()
        b = open(os.path.join(my_out, f), "rb").read()
        assert a == b, f"combine: {f} differs"
    sa = CoStat.read(ref_out)
    sb = CoStat.read(my_out)
    np.testing.assert_array_equal(sa.ctx_ct, sb.ctx_ct)
    assert sa.all_ctx_ct == sb.all_ctx_ct


def test_device_union_matches_np_unique():
    """device_union (per-device sorted-merge + host run merge) must
    equal np.unique exactly, with and without capped counts, on the
    8-device CPU mesh — incl. duplicate-heavy, cross-shard duplicates,
    empty, and pad-value inputs."""
    from metakssd_tpu.parallel import mesh as pmesh

    m = pmesh.make_mesh(n_db=1)
    rng = np.random.default_rng(17)
    cases = [
        rng.integers(0, 1 << 20, 1 << 16, dtype=np.uint32),   # dup heavy
        rng.integers(0, 1 << 31, 100001, dtype=np.uint32),    # odd size
        np.repeat(rng.integers(0, 999, 500, dtype=np.uint32), 17),
        np.zeros(0, np.uint32),
        np.array([0xFFFFFFFF, 0xFFFFFFFF, 1, 2], np.uint32),  # pad value
        np.arange(7, dtype=np.uint32),                        # < n_dev
    ]
    for ids in cases:
        want = np.unique(ids)
        got = pmesh.device_union(ids, m)
        np.testing.assert_array_equal(got, want), ids.size
        want_v, want_c = np.unique(ids, return_counts=True)
        got_v, got_c = pmesh.device_union(ids, m, return_counts=True)
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(np.minimum(want_c, 2) == 1,
                                      got_c == 1)


@needs_oracle
def test_device_setops_byte_identical(codir, monkeypatch):
    """set -u / -q routed through the device union (MKSSD_DEVICE_SETOPS=1)
    must write byte-identical pan/uniq_pan files."""
    tmp, co = codir
    host_u = str(tmp / "dev_pan_host")
    host_q = str(tmp / "dev_upan_host")
    setops.sketch_union(co, host_u)
    setops.uniq_sketch_union(co, host_q)
    monkeypatch.setenv("MKSSD_DEVICE_SETOPS", "1")
    dev_u = str(tmp / "dev_pan_dev")
    dev_q = str(tmp / "dev_upan_dev")
    setops.sketch_union(co, dev_u)
    setops.uniq_sketch_union(co, dev_q)
    monkeypatch.delenv("MKSSD_DEVICE_SETOPS")
    for host_d, dev_d, prefix in ((host_u, dev_u, "pan"),
                                  (host_q, dev_q, "uniq_pan")):
        names = [f for f in sorted(os.listdir(host_d))
                 if f.startswith(prefix)]
        assert names
        for f in names:
            a = open(os.path.join(host_d, f), "rb").read()
            b = open(os.path.join(dev_d, f), "rb").read()
            assert a == b, (prefix, f)


@needs_oracle
def test_union_parity_above_radix_threshold(tmp_path):
    """set -u byte parity vs the oracle ABOVE the native radix-sort
    routing threshold (>= 1M ids; the small shared fixture stays on the
    np.unique path), with within- and cross-genome duplicates."""
    rng = np.random.default_rng(17)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=17)
    p = shuf.params
    co = str(tmp_path / "co")
    os.makedirs(co)
    nG, per = 6, 200_000
    ids_all, index = [], [0]
    pool = rng.choice(np.uint32(1) << 28, 500_000,
                      replace=False).astype(np.uint32)
    for g in range(nG):
        ids_all.append(np.sort(rng.choice(pool, per, replace=False)))
        index.append(index[-1] + per)
    np.concatenate(ids_all).tofile(os.path.join(co, "combco.0"))
    np.array(index, dtype=np.uint64).tofile(
        os.path.join(co, "combco.index.0"))
    ctx = np.full(nG, per, np.uint32)
    CoStat(shuf_id=p.shuf_id, koc=False, kmerlen=2 * p.k,
           dim_rd_len=2 * p.drlevel, comp_num=p.component_num,
           all_ctx_ct=int(ctx.sum()), ctx_ct=ctx,
           names=[f"g{i}" for i in range(nG)]).write(co)
    ref_out = str(tmp_path / "pan_ref")
    my_out = str(tmp_path / "pan_mine")
    oracle.run(["set", "-u", "-o", ref_out, co])
    setops.sketch_union(co, my_out)
    a = open(os.path.join(ref_out, "pan.0"), "rb").read()
    b = open(os.path.join(my_out, "pan.0"), "rb").read()
    assert len(a) >= 4 * 400_000     # ~95% pool coverage expected
    assert a == b
