"""GTDB-scale profiling rehearsal: full chain (MarkerDB -> composite
profile -> poisson post-processing) ours-vs-oracle at the real corpus
shape — 81920 species, ~33M distinct marker k-mers (L3K11 sizing),
~50M postings, 8 query metagenome sketches of ~64 species each.

Outputs latency + peak RSS per side and asserts the profile TSV and
poisson output are identical (reference chain:
command_composite.c get_species_abundance + src/possion.kssd2out.pl).

Usage:  python benchmarks/time_profile_scale.py   (env NSP/NKM/NQ to
shrink; writes under PROFILE_WORK=/tmp/profile_scale, ~1 GiB)
"""
import os
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NSP = int(os.environ.get("NSP", 81920))
NKM = int(os.environ.get("NKM", 33_000_000))   # distinct marker k-mers
MEAN_MARKERS = int(os.environ.get("MEAN_MARKERS", 600))
NQ = int(os.environ.get("NQ", 8))
SPECIES_PER_SAMPLE = 64
WORK = os.environ.get("PROFILE_WORK", "/tmp/profile_scale")

from metakssd_tpu.formats.costat import CoStat  # noqa: E402

ORACLE = os.path.join(REPO, ".oracle", "metakssd_")
PERL_POISSON = "/root/reference/src/possion.kssd2out.pl"


def build_markerdb(rng):
    db = os.path.join(WORK, "markerdb")
    if os.path.exists(os.path.join(db, "cofiles.stat")):
        return db
    os.makedirs(db, exist_ok=True)
    t0 = time.time()
    # distinct k-mer pool (L3K11 dim space is 2^28 after reduction)
    pool = np.unique(rng.integers(0, 1 << 28, int(NKM * 1.07),
                                  dtype=np.uint32))
    print(f"pool: {pool.size/1e6:.1f}M distinct k-mers", flush=True)
    # per-species marker counts, lognormal-ish
    cnt = np.maximum(8, rng.lognormal(np.log(MEAN_MARKERS), 0.6,
                                      NSP)).astype(np.int64)
    total = int(cnt.sum())
    draws = pool[rng.integers(0, pool.size, total)]
    owner = np.repeat(np.arange(NSP, dtype=np.int32), cnt)
    order = np.lexsort((draws, owner))
    ids = draws[order]
    # dedup within each species (sketches are per-genome sets)
    keep = np.ones(total, bool)
    same_owner = owner[1:] == owner[:-1]       # owner already sorted
    keep[1:] = ~(same_owner & (ids[1:] == ids[:-1]))
    ids = ids[keep]
    per = np.bincount(owner[keep], minlength=NSP).astype(np.int64)
    index = np.zeros(NSP + 1, np.uint64)
    np.cumsum(per, out=index[1:])
    ids.astype(np.uint32).tofile(os.path.join(db, "combco.0"))
    index.tofile(os.path.join(db, "combco.index.0"))
    stat = CoStat(7, False, 11, 6, 1, int(ids.size),
                  per.astype(np.uint32),
                  [f"{i}_sp{i:06d}" for i in range(NSP)])
    stat.write(db)
    print(f"markerdb: {NSP} species, {ids.size/1e6:.1f}M postings "
          f"({time.time()-t0:.1f}s)", flush=True)
    return db


def build_queries(rng, db):
    qdir = os.path.join(WORK, "qco")
    if os.path.exists(os.path.join(qdir, "cofiles.stat")):
        return qdir
    os.makedirs(qdir, exist_ok=True)
    ids_all = np.fromfile(os.path.join(db, "combco.0"), np.uint32)
    index = np.fromfile(os.path.join(db, "combco.index.0"), np.uint64)
    pop = 1.0 / np.arange(1, NSP + 1)
    pop /= pop.sum()
    q_ids, q_ab, per = [], [], []
    for q in range(NQ):
        sp = np.unique(rng.choice(NSP, SPECIES_PER_SAMPLE, p=pop))
        parts = []
        for s in sp:
            row = ids_all[int(index[s]):int(index[s + 1])]
            take = rng.random(row.size) < 0.7
            parts.append(row[take])
        noise = rng.integers(0, 1 << 28, 5000, dtype=np.uint32)
        ids = np.unique(np.concatenate(parts + [noise]))
        ab = rng.integers(1, 120, ids.size).astype(np.uint16)
        q_ids.append(ids)
        q_ab.append(ab)
        per.append(ids.size)
    index = np.zeros(NQ + 1, np.uint64)
    np.cumsum(per, out=index[1:])
    np.concatenate(q_ids).astype(np.uint32).tofile(
        os.path.join(qdir, "combco.0"))
    np.concatenate(q_ab).tofile(os.path.join(qdir, "combco.0.a"))
    index.tofile(os.path.join(qdir, "combco.index.0"))
    stat = CoStat(7, True, 11, 6, 1, int(index[-1]),
                  np.asarray(per, np.uint32),
                  [f"sample{q:02d}" for q in range(NQ)])
    stat.write(qdir)
    print(f"queries: {NQ} samples, ~{int(np.mean(per))} k-mers each",
          flush=True)
    return qdir


def timed_run(argv, env=None, want_stderr=False):
    """(stdout, wall seconds, peak RSS MiB[, stderr]) of a subprocess."""
    t0 = time.time()
    p = subprocess.Popen(argv, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE if want_stderr
                         else subprocess.DEVNULL, env=env)
    out = p.stdout.read()
    # stderr is a few short lines (< pipe buffer), safe to read after
    err = p.stderr.read() if want_stderr else b""
    pid, status, ru = os.wait4(p.pid, 0)
    p.returncode = os.waitstatus_to_exitcode(status)
    p.stdout.close()
    if want_stderr:
        p.stderr.close()
    wall = time.time() - t0
    assert p.returncode == 0, (argv, p.returncode, err[-500:])
    if want_stderr:
        return out, wall, ru.ru_maxrss / 1024, err
    return out, wall, ru.ru_maxrss / 1024


def main():
    os.makedirs(WORK, exist_ok=True)
    rng = np.random.default_rng(41)
    db = build_markerdb(rng)
    qdir = build_queries(rng, db)

    # host-only production config: no TPU plugin sitecustomize, no jax
    # import at all (the composite host path is jax-free; the plugin
    # preload alone costs ~2.4 s of the cold budget)
    ours_code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import resource\n"
        "from metakssd_tpu import composite\n"
        "from metakssd_tpu.utils import TIMER\n"
        "composite.get_species_abundance(%r, %r, use_device=False)\n"
        "assert 'jax' not in sys.modules, 'host path pulled jax'\n"
        "TIMER.report()\n"
        % (REPO, db, qdir))
    env = dict(os.environ, MKSSD_LOG="json")
    env["PYTHONPATH"] = REPO     # drop the axon sitecustomize preload
    ours_out, ours_t, ours_rss, ours_err = timed_run(
        [sys.executable, "-c", ours_code], env=env, want_stderr=True)
    import json
    stages = {}
    for ln in ours_err.decode().splitlines():
        if ln.startswith("{"):
            stages = json.loads(ln).get("stages", {})
    per_q = stages.get("composite.profile", 0) / NQ
    print(f"ours:   {ours_t:.2f}s total, peak RSS {ours_rss:.0f} MiB | "
          f"stage_markerdb {stages.get('composite.stage_markerdb', 0):.2f}s "
          f"once, then {per_q:.3f}s/query", flush=True)

    ref_out, ref_t, ref_rss = timed_run(
        [ORACLE, "composite", "-r", db, "-q", qdir])
    print(f"oracle: {ref_t:.2f}s total, {ref_t/NQ:.3f}s/query, "
          f"peak RSS {ref_rss:.0f} MiB", flush=True)

    ours_lines = [l for l in ours_out.decode().splitlines()
                  if l.count("\t") == 6]
    ref_lines = [l for l in ref_out.decode().splitlines()
                 if l.count("\t") == 6]
    assert ours_lines == ref_lines, (
        f"profile TSV differs: {len(ours_lines)} vs {len(ref_lines)} "
        "lines")
    print(f"profile TSV identical ({len(ours_lines)} lines)", flush=True)

    # post-processing chain: poisson relative abundance, ours vs perl
    tsv = os.path.join(WORK, "profile.tsv")
    with open(tsv, "w") as f:
        f.write("\n".join(ours_lines) + "\n")
    t0 = time.time()
    import io
    from metakssd_tpu.postprocess import poisson
    buf = io.StringIO()
    with open(tsv) as f:
        poisson.poisson_abundance(f, shkm_thr=6, out=buf)
    ours_poisson = buf.getvalue()
    ours_pt = time.time() - t0
    perl_out, perl_t, _ = timed_run(["perl", PERL_POISSON, tsv, "6"])
    # perl's tie order is hash-randomized PER RUN (PERL_HASH_SEED), so
    # equal-depth rows permute between invocations; compare the
    # canonicalized relation (ours is deterministic)
    assert sorted(ours_poisson.splitlines()) == \
        sorted(perl_out.decode().splitlines()), "poisson output differs"
    print(f"poisson identical ({ours_pt:.2f}s ours vs {perl_t:.2f}s "
          f"perl)", flush=True)
    print(f"\nSUMMARY nsp={NSP} distinct~{NKM} nq={NQ}: "
          f"ours total {ours_t:.1f}s (staged {per_q*1000:.0f} ms/q) "
          f"rss {ours_rss:.0f}MiB | oracle total {ref_t:.1f}s "
          f"({ref_t/NQ:.2f}s/q) rss {ref_rss:.0f}MiB | "
          f"total speedup {ref_t/ours_t:.1f}x")


if __name__ == "__main__":
    main()
