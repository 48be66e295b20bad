"""Property-fuzz parity harness: randomized configs vs the oracle.

Each case draws a random sketch config (k 5-14, subk 3-6, drlevel with
the reference's primer-index constraint 4 <= k-drlevel <= 8,
command_dist.c:286-315), a random COMPONENT_SZ build (default 8 / cs6),
a random input class (fasta with N-runs / short-seq edges /
multi-file dirs exercising the batched stage-I engine, fastq plain or
gzipped with random quality strings), and random mode flags (-u / -n / -Q / -A;
fastq2co applies -n/-Q, the -A path has no quality filter,
command_dist.c:385 + iseq2comem.c mt_shortreads2koc), then asserts
set-level (and koc count) parity of the PRODUCT path
(pipeline.run_stage1) against the oracle binary on the same .shuf.

Time-boxed: ~MKSSD_FUZZ_SECONDS (default 25) seconds of cases in CI.
A failing case prints its case seed; reproduce exactly that case with
    MKSSD_FUZZ_SEED=<seed> python -m pytest tests/test_fuzz_parity.py

(subk is capped at 6: the shuffle table is 4^(2*subk) ints, so subk=7
would mean a 1 GiB .shuf — beyond anything the reference ships.)

Inputs are sized to stay inside the reference's context-space budget:
its sketch hash table is a fixed primer[4*(k-drlevel)-15] slots;
fasta2co errs at 60% load ("context space is too crowd", use -k+1) and
fastq2co SILENTLY DROPS k-mers once the table is 100% full (keycount
is never incremented there — iseq2comem.c:346,399 — so the guard never
fires; found by this fuzzer, case_seed=1004).  The dropped set depends
on insertion order, so saturating configs have no well-defined
reference semantics to match (docs/PARITY.md "sketch capacity").
"""

import dataclasses
import os
import time

import numpy as np
import pytest

from metakssd_tpu import pipeline
from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.shuf import make_shuf, write_shuf
from metakssd_tpu.params import SketchParams

from tests import oracle
from tests.util import random_seq, write_fasta, write_fastq

BUDGET_S = float(os.environ.get("MKSSD_FUZZ_SECONDS", "25"))
MAX_CASES = int(os.environ.get("MKSSD_FUZZ_MAX_CASES", "200"))
ENV_SEED = os.environ.get("MKSSD_FUZZ_SEED")
# base of the sequential case-seed window (vary to explore fresh cases
# across sessions; each case is fully determined by its seed)
BASE = int(os.environ.get("MKSSD_FUZZ_BASE", "1000"))

# deterministic opening cases covering previously-untested classes:
# multi-component koc at high k (cs6, k-drlevel=7 -> 16 components) and
# the full-width uint32 id case (k-drlevel=8)
_PINNED = [101, 102]


def _draw_config(rng):
    subk = int(rng.integers(3, 7))
    k = int(rng.integers(max(5, subk), min(14, subk + 8) + 1))
    lo, hi = max(0, k - 8), min(subk, k - 4)
    drlevel = int(rng.integers(lo, hi + 1))
    variant = "default" if rng.random() < 0.6 else "cs6"
    fmt = "fastq" if rng.random() < 0.5 else "fasta"
    # stay under ~30% of the reference's hash capacity (see module doc):
    # expected sketched k-mers ~ input_bases * accept_fraction, where
    # dim_end floors at MIN_SUBCTX_DIM_SMP_SZ=4096 (iseq2comem.c:84) —
    # for small subk the dim reduction is a no-op and every window is
    # sketched
    p = SketchParams(k=k, subk=subk, drlevel=drlevel)
    accept_frac = min(1.0, p.dim_end / p.shuf_len)
    cap = int(0.3 * 0.6 * p.hashsize / accept_frac)
    cfg = {"k": k, "subk": subk, "drlevel": drlevel, "variant": variant,
           "fmt": fmt, "cap_bases": cap, "mode_flags": [], "opts": {},
           # gz ingestion (decompress-ahead/native inflate paths) and
           # multi-file fasta dirs (the batched stage-I engine)
           "gzip": fmt == "fastq" and rng.random() < 0.25,
           "nfiles": int(rng.integers(2, 4))
           if fmt == "fasta" and rng.random() < 0.3 else 1}
    if fmt == "fasta":
        if rng.random() < 0.3:
            cfg["mode_flags"] = ["-u"]
            cfg["opts"] = {"dedup": True}
    else:
        if rng.random() < 0.45:
            cfg["mode_flags"] = ["-A"]
            cfg["opts"] = {"abundance": True}
        else:
            n = int(rng.integers(1, 4))
            q = int(rng.choice([0, 20, 30]))
            cfg["mode_flags"] = ["-n", str(n), "-Q", str(q)]
            cfg["opts"] = {"min_occ": n, "min_qual": q}
    return cfg


def _pinned_config(case_seed):
    if case_seed == 101:  # multi-component koc (16 comps at cs6)
        return {"k": 13, "subk": 6, "drlevel": 6, "variant": "cs6",
                "fmt": "fastq", "mode_flags": ["-A"],
                "opts": {"abundance": True}}
    return {"k": 14, "subk": 6, "drlevel": 6, "variant": "default",
            "fmt": "fasta", "mode_flags": [], "opts": {}}  # 32-bit ids


def _gen_input(rng, cfg, path):
    cap = cfg.get("cap_bases", 1 << 30)
    if cfg["fmt"] == "fasta":
        nseq = int(rng.integers(1, 4))
        budget = min(cap, 25000)
        seqs = []
        for _ in range(nseq):
            n = int(rng.integers(40, max(41, budget // nseq)))
            if rng.random() < 0.3 and len(seqs) > 0:
                n = int(rng.integers(1, 4 * cfg["k"]))  # sub-window edge
            seqs.append(random_seq(rng, n,
                                   n_prob=float(rng.choice([0, 0.005]))))
        if rng.random() < 0.3:   # duplicated segment (stresses -u)
            seqs.append(seqs[0][: len(seqs[0]) // 2] * 2)
        write_fasta(path, seqs, line_width=int(rng.integers(37, 90)))
    else:
        gmax = max(40, min(cap, 15000))
        genome = random_seq(rng, int(rng.integers(gmax // 3 + 1,
                                                  gmax + 1)))
        nreads = int(rng.integers(200, 1500))
        rlen = int(rng.integers(max(40, 2 * cfg["k"] + 2), 151))
        reads, quals = [], []
        for _ in range(nreads):
            s = int(rng.integers(0, max(1, len(genome) - rlen)))
            reads.append(genome[s:s + rlen])
            # random phred 0..40 qualities to stress the -Q mask
            quals.append("".join(chr(33 + q) for q in
                                 rng.integers(0, 41, rlen)))
        reads.append(genome[:int(rng.integers(1, 2 * cfg["k"]))])  # short
        quals.append("I" * len(reads[-1]))
        write_fastq(path, reads, quals)


_SHUF_CACHE: dict = {}


def _get_shuf(tmpdir, cfg):
    key = (cfg["k"], cfg["subk"], cfg["drlevel"])
    if key not in _SHUF_CACHE:
        # deterministic seed (NOT hash(): Python salts tuple hashes per
        # process, which would make failing cases unreproducible)
        shuf = make_shuf(SketchParams(k=cfg["k"], subk=cfg["subk"],
                                      drlevel=cfg["drlevel"]),
                         seed=key[0] * 10007 + key[1] * 101 + key[2])
        p = os.path.join(tmpdir, f"k{key[0]}s{key[1]}l{key[2]}.shuf")
        write_shuf(p, shuf)
        _SHUF_CACHE[key] = (shuf, p)
    return _SHUF_CACHE[key]


def _run_case(tmpdir, case_seed: int, pinned: bool) -> None:
    rng = np.random.default_rng(case_seed)
    cfg = _pinned_config(case_seed) if pinned else _draw_config(rng)
    if oracle.ensure_oracle(cfg["variant"]) is None:
        pytest.skip(f"no {cfg['variant']} oracle")
    shuf, shufp = _get_shuf(tmpdir, cfg)
    comp_sz = 8 if cfg["variant"] == "default" else 6
    if comp_sz != shuf.params.component_sz:
        shuf = dataclasses.replace(
            shuf, params=dataclasses.replace(shuf.params,
                                             component_sz=comp_sz))
    d = os.path.join(tmpdir, f"case{case_seed}")
    os.makedirs(d, exist_ok=True)
    nfiles = cfg.get("nfiles", 1)
    inputs = []
    for fi in range(nfiles):
        inp = os.path.join(d, f"in{fi}." + ("fq" if cfg["fmt"] == "fastq"
                                            else "fa"))
        _gen_input(rng, cfg, inp)
        inputs.append(inp)
    if cfg.get("gzip"):
        import gzip
        gz = inputs[0] + ".gz"
        with open(inputs[0], "rb") as f, gzip.open(gz, "wb") as g:
            g.write(f.read())
        os.remove(inputs[0])
        inputs = [gz]
    ctx = f"case_seed={case_seed} cfg={cfg} " \
          f"(reproduce: MKSSD_FUZZ_SEED={case_seed})"

    # -p 1: the reference's mt_shortreads2koc increments its shared
    # hash table without atomics (iseq2comem.c:675-707), so -A counts
    # are non-deterministic (+-1 lost updates) at p > 1 — found by this
    # fuzzer (case 1011/1021).  Single-threaded, it matches us exactly.
    oracle.run(["dist", "-L", shufp, "-p", "1", *cfg["mode_flags"],
                "-o", os.path.join(d, "ref"), *inputs],
               variant=cfg["variant"])
    opts = pipeline.SketchOptions(**cfg["opts"])
    pipeline.run_stage1(inputs, shuf, os.path.join(d, "mine"), opts)

    ref = CoDir.read(os.path.join(d, "ref"))
    mine = CoDir.read(os.path.join(d, "mine"))
    assert ref.stat.comp_num == mine.stat.comp_num, ctx
    assert ref.stat.koc == mine.stat.koc, ctx
    # map genomes by basename: the oracle randomises multi-file order
    rmap = {os.path.basename(n): g for g, n in enumerate(ref.stat.names)}
    mmap_ = {os.path.basename(n): g
             for g, n in enumerate(mine.stat.names)}
    assert set(rmap) == set(mmap_), ctx
    for name in rmap:
        rg, mg = rmap[name], mmap_[name]
        dropped0 = 0
        for c in range(ref.stat.comp_num):
            ri = ref.genome_ids(c, rg)
            mi = mine.genome_ids(c, mg)
            mab = mine.genome_abund(c, mg) if ref.stat.koc else None
            # tolerate the reference's slot-0 bug: a drtuple of value 0
            # (component 0, id 0) cannot live in its open-addressing
            # table (0 == empty slot) and is silently dropped from its
            # sketches; we keep it (docs/PARITY.md).  First hit by the
            # fuzzer at case 300370 (k=6 drlevel=0: 24-bit drtuple
            # space makes id 0 actually reachable).
            if c == 0 and mi.size and mi[0] == 0 and \
                    not (ri.size and ri.min() == 0):
                mi = mi[1:]
                if mab is not None:
                    mab = mab[1:]
                dropped0 = 1
            order = np.argsort(ri, kind="stable")
            np.testing.assert_array_equal(
                ri[order], mi, err_msg=f"{ctx} {name} comp={c}")
            if ref.stat.koc:
                np.testing.assert_array_equal(
                    ref.genome_abund(c, rg)[order], mab,
                    err_msg=f"{ctx} {name} comp={c} counts")
        assert int(ref.stat.ctx_ct[rg]) + dropped0 == \
            int(mine.stat.ctx_ct[mg]), (ctx, name)


def test_fuzz_parity(tmp_path_factory):
    if oracle.ensure_oracle() is None:
        pytest.skip("no oracle")
    tmpdir = str(tmp_path_factory.mktemp("fuzz"))
    if ENV_SEED is not None:
        seed = int(ENV_SEED)
        _run_case(tmpdir, seed, pinned=seed in _PINNED)
        return
    t0 = time.time()
    ran = 0
    for case_seed in _PINNED:
        _run_case(tmpdir, case_seed, pinned=True)
        ran += 1
    while time.time() - t0 < BUDGET_S and ran < MAX_CASES:
        _run_case(tmpdir, BASE + ran, pinned=False)
        ran += 1
    assert ran >= len(_PINNED) + 3, \
        f"only {ran} fuzz cases ran inside {BUDGET_S}s"


# ---------------------------------------------------------------------
# set-algebra + composite fuzz: random sketch dirs, artifact-level
# oracle parity (the stage-I fuzz above proves sketch parity; these
# consume ORACLE-produced dirs so they isolate command_set /
# command_composite semantics)
# ---------------------------------------------------------------------

SETOPS_BUDGET_S = float(os.environ.get("MKSSD_FUZZ_SETOPS_SECONDS", "15"))


def _draw_setop_config(rng):
    subk = int(rng.integers(4, 7))
    # cap k-drlevel at 7 (<= 16 components at cs6) to bound file counts
    k = int(rng.integers(max(6, subk), min(13, subk + 7) + 1))
    lo, hi = max(0, k - 7), min(subk, k - 4)
    drlevel = int(rng.integers(lo, hi + 1))
    variant = "default" if rng.random() < 0.6 else "cs6"
    p = SketchParams(k=k, subk=subk, drlevel=drlevel)
    accept_frac = min(1.0, p.dim_end / p.shuf_len)
    cap = int(0.3 * 0.6 * p.hashsize / accept_frac)
    return {"k": k, "subk": subk, "drlevel": drlevel, "variant": variant,
            "cap_bases": cap, "ngen": int(rng.integers(2, 6))}


def _run_setop_case(tmpdir, case_seed: int) -> None:
    import shutil

    rng = np.random.default_rng(case_seed)
    cfg = _draw_setop_config(rng)
    if oracle.ensure_oracle(cfg["variant"]) is None:
        pytest.skip(f"no {cfg['variant']} oracle")
    shuf, shufp = _get_shuf(tmpdir, cfg)
    d = os.path.join(tmpdir, f"setcase{case_seed}")
    shutil.rmtree(d, ignore_errors=True)
    gdir = os.path.join(d, "g")
    os.makedirs(gdir)
    ctx = f"setop case_seed={case_seed} cfg={cfg} " \
          f"(reproduce: MKSSD_FUZZ_SEED={case_seed} " \
          f"-k test_fuzz_setops)"
    # overlapping genome family: base + splices/mutations + one
    # unrelated, sized inside the reference capacity envelope
    per = max(80, min(cfg["cap_bases"] // (cfg["ngen"] + 1), 12000))
    base = random_seq(rng, per)
    for gi in range(cfg["ngen"]):
        r = rng.random()
        if gi == 0 or r < 0.3:
            g = base if gi == 0 else random_seq(rng, per)
        elif r < 0.65:
            cut = int(rng.integers(1, per))
            g = base[:cut] + random_seq(rng, per - cut)   # splice
        else:
            arr = np.frombuffer(base.encode(), np.uint8).copy()
            idx = rng.random(arr.size) < 0.05
            arr[idx] = np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, int(idx.sum()))]
            g = arr.tobytes().decode()                    # mutate
        write_fasta(os.path.join(gdir, f"g{gi}.fa"), [g])
    co = os.path.join(d, "co")
    oracle.run(["dist", "-L", shufp, "-o", co, gdir],
               variant=cfg["variant"])

    from metakssd_tpu import setops
    from metakssd_tpu.formats.costat import CoStat
    ncomp = CoStat.read(co).comp_num

    def _cmp_files(rdir, mdir, prefix):
        for c in range(ncomp):
            f = f"{prefix}.{c}"
            a = open(os.path.join(rdir, f), "rb").read()
            b = open(os.path.join(mdir, f), "rb").read()
            assert a == b, f"{ctx}: {f} differs"

    # -u / -q: byte-identical pan outputs
    oracle.run(["set", "-u", "-o", os.path.join(d, "pan_r"), co],
               variant=cfg["variant"])
    setops.sketch_union(co, os.path.join(d, "pan_m"))
    _cmp_files(os.path.join(d, "pan_r"), os.path.join(d, "pan_m"), "pan")
    oracle.run(["set", "-q", "-o", os.path.join(d, "upan_r"), co],
               variant=cfg["variant"])
    setops.uniq_sketch_union(co, os.path.join(d, "upan_m"))
    _cmp_files(os.path.join(d, "upan_r"), os.path.join(d, "upan_m"),
               "uniq_pan")

    # -s / -i against the uniq pan: byte-identical combco outputs
    for flag, intersect in (("-s", False), ("-i", True)):
        rdir = os.path.join(d, f"op{flag[1]}_r")
        mdir = os.path.join(d, f"op{flag[1]}_m")
        oracle.run(["set", flag, os.path.join(d, "upan_r"), "-o", rdir,
                    co], variant=cfg["variant"])
        setops.sketch_operate(co, os.path.join(d, "upan_r"), mdir,
                              intersect=intersect)
        _cmp_files(rdir, mdir, "combco")
        _cmp_files(rdir, mdir, "combco.index")

    # -g with a random taxon table (incl. a dropped taxid-0 genome)
    taxf = os.path.join(d, "tax.tsv")
    tax = rng.integers(0, 4, cfg["ngen"])
    with open(taxf, "w") as f:
        for t in tax:
            f.write(f"{100 + t}\tTax{t}\n" if t else "0\n")
    if (tax != 0).any():
        rdir, mdir = os.path.join(d, "grp_r"), os.path.join(d, "grp_m")
        oracle.run(["set", "-g", taxf, "-o", rdir, co],
                   variant=cfg["variant"])
        setops.grouping_genomes(co, taxf, mdir)
        sa, sb = CoStat.read(rdir), CoStat.read(mdir)
        assert sa.names == sb.names, ctx
        np.testing.assert_array_equal(sa.ctx_ct, sb.ctx_ct, err_msg=ctx)
        # per-taxon unions as SETS: the reference emits its hash-table
        # order here (unlike -u/-s/-i outputs), so bytes differ
        ga = CoDir.read(rdir, want_abund=False)
        gb = CoDir.read(mdir, want_abund=False)
        for ti in range(len(sa.names)):
            for c in range(ncomp):
                np.testing.assert_array_equal(
                    np.sort(ga.genome_ids(c, ti)), gb.genome_ids(c, ti),
                    err_msg=f"{ctx} taxon {ti} comp {c}")

    # reverse: k-mer recovery line-set parity per genome.  Exact ONLY
    # at subk - drlevel == 3: above that the reference's rev table
    # covers pfilters < MIN_SUBCTX_DIM_SMP_SZ=4096 only
    # (command_reverse.c:155); below it the pfilter ADDS past its
    # 4^(subk-drlevel) bit slot into the outer-context bits
    # (iseq2comem.c:291-294 is an arithmetic +, carries alias), so
    # reversal is ambiguous and a reconstructed k-mer can flip strands
    # on re-canonicalization — in that regime the two tools pick
    # different (equally valid) decompositions.
    if cfg["subk"] - cfg["drlevel"] == 3:
        from metakssd_tpu import reverse as rev_mod
        rr, rm = os.path.join(d, "rev_r"), os.path.join(d, "rev_m")
        os.makedirs(rr, exist_ok=True)
        oracle.run(["reverse", "-L", shufp, "-o", rr, co],
                   variant=cfg["variant"])
        rev_mod.co_reverse2kmer(co, shufp, rm)
        ref_files = sorted(f for f in os.listdir(rr)
                           if not f.startswith("."))
        assert ref_files == sorted(
            f for f in os.listdir(rm) if not f.startswith(".")), ctx
        for f in ref_files:
            a = sorted(open(os.path.join(rr, f)).read().splitlines())
            b = sorted(open(os.path.join(rm, f)).read().splitlines())
            assert a == b, f"{ctx}: reverse {f} differs"

    # composite profiling on a koc query drawn from the genome mix
    reads = []
    src = base + random_seq(rng, 200)
    rlen = 100
    for _ in range(int(rng.integers(150, 600))):
        s0 = int(rng.integers(0, max(1, len(src) - rlen)))
        reads.append(src[s0:s0 + rlen])
    write_fastq(os.path.join(d, "r.fq"), reads)
    oracle.run(["dist", "-L", shufp, "-A", "-p", "1", "-o",
                os.path.join(d, "qko"), os.path.join(d, "r.fq")],
               variant=cfg["variant"])
    import io as _io
    from metakssd_tpu import composite
    buf = _io.StringIO()
    composite.get_species_abundance(co, os.path.join(d, "qko"), out=buf,
                                    use_device=False)
    # the reference composite SIGFPEs when any query component holds
    # <= 1 k-mer: its per-query double-hash H2 = 1 + K % (hash_sz - 1)
    # divides by zero at hash_sz <= 1 (global_basic.h:283,
    # command_composite.c:535) — found by this fuzzer (case 5020).
    # Ours handles those inputs; only the oracle COMPARISON is gated.
    qcd = CoDir.read(os.path.join(d, "qko"), want_abund=False)
    qmin = min(qcd.genome_ids(c, 0).size
               for c in range(qcd.stat.comp_num))
    if qmin >= 2:
        r = oracle.run(["composite", "-r", co, "-q",
                        os.path.join(d, "qko")], variant=cfg["variant"])
        ref_lines = [ln for ln in r.stdout.splitlines()
                     if ln.count("\t") == 6]
        assert buf.getvalue().splitlines() == ref_lines, ctx
    # join the background sidecar writer before deleting its target
    # (the rmtree-under-writer race also exposed a _FileSink
    # double-close; both are fixed, but don't re-create the race)
    composite.wait_staging()
    composite._COMP_CACHE.clear()
    shutil.rmtree(d, ignore_errors=True)


def test_fuzz_setops(tmp_path_factory):
    if oracle.ensure_oracle() is None:
        pytest.skip("no oracle")
    tmpdir = str(tmp_path_factory.mktemp("fuzz_set"))
    if ENV_SEED is not None:
        _run_setop_case(tmpdir, int(ENV_SEED))
        return
    t0 = time.time()
    ran = 0
    while time.time() - t0 < SETOPS_BUDGET_S and ran < MAX_CASES:
        _run_setop_case(tmpdir, 4 * BASE + 1000 + ran)
        ran += 1
    assert ran >= 1, f"no setop fuzz case completed in {SETOPS_BUDGET_S}s"
