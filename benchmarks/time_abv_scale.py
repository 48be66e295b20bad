"""abv search at GTDB scale: sparse posting walk (ours + oracle binary)
vs the dense MXU path, on a synthetic corpus of NSAMP samples over
NSP ~ 81920 species with zipf-ish species popularity (a handful of
species occur in most samples, the tail is rare) — the shape of real
metagenome abundance-vector collections."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NSP = int(os.environ.get("NSP", 81920))
NSAMP = int(os.environ.get("NSAMP", 8192))
ND = int(os.environ.get("ND", 64))          # mean species per sample
NQ = 64
WORK = os.environ.get("ABV_WORK", "/tmp/abv_scale")

from metakssd_tpu.formats.abv import write_abv_file  # noqa: E402
from metakssd_tpu.formats.costat import CoStat  # noqa: E402
from metakssd_tpu import composite  # noqa: E402


def build_corpus():
    abvdir = os.path.join(WORK, "abundance_Vec")
    os.makedirs(abvdir, exist_ok=True)
    if not os.path.exists(os.path.join(WORK, "cofiles.stat")):
        # minimal MarkerDB stat (index_abv only reads infile_num)
        stat = CoStat(1, False, 16, 4, 1, NSP,
                      np.ones(NSP, np.uint32),
                      [f"sp{i}" for i in range(NSP)])
        stat.write(WORK)
    if len(os.listdir(abvdir)) >= NSAMP:
        return abvdir
    rng = np.random.default_rng(11)
    # zipf-ish popularity over species
    pop = 1.0 / np.arange(1, NSP + 1)
    pop /= pop.sum()
    for s in range(NSAMP):
        nd = max(2, int(rng.poisson(ND)))
        idx = np.unique(rng.choice(NSP, nd, p=pop)).astype(np.int32)
        pct = (rng.random(idx.size).astype(np.float32) * 10
               + np.float32(0.01))
        write_abv_file(os.path.join(abvdir, f"s{s:05d}.abv"),
                       np.sort(idx), pct)
    return abvdir


def main():
    t0 = time.time()
    abvdir = build_corpus()
    print(f"corpus: {NSAMP} samples x ~{ND} of {NSP} species "
          f"({time.time()-t0:.1f} s)", flush=True)
    t0 = time.time()
    idx = composite.index_abv(WORK)
    print(f"index_abv: {time.time()-t0:.1f} s, "
          f"{idx.abm_idx.size} postings", flush=True)
    qnames = sorted(os.listdir(abvdir))[:NQ]
    qpaths = [os.path.join(abvdir, q) for q in qnames]

    import io
    for mode in (0, 2):
        buf = io.StringIO()
        composite.abv_search(WORK, qpaths[:2], mode=mode, out=buf)  # warm
        t0 = time.time()
        buf = io.StringIO()
        composite.abv_search(WORK, qpaths, mode=mode, out=buf)
        dt = time.time() - t0
        print(f"sparse mode={mode}: {NQ/dt:.1f} q/s "
              f"({dt*1000/NQ:.2f} ms/q)", flush=True)

    # oracle on the same (byte-compatible) index
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import oracle
    binpath = oracle.ensure_oracle()
    if binpath:
        import subprocess
        t0 = time.time()
        r = subprocess.run([binpath, "composite", "-r", WORK, "-s", "2"]
                           + qnames, capture_output=True, cwd=abvdir)
        dt = time.time() - t0
        lines = len(r.stdout.splitlines())
        print(f"oracle mode=2: {NQ/dt:.1f} q/s (rc={r.returncode}, "
              f"{lines} lines)", flush=True)

    if os.environ.get("ABV_DENSE") == "1":
        t0 = time.time()
        import io
        buf = io.StringIO()
        composite.abv_search_dense(WORK, qpaths[:2], mode=2, out=buf)
        print(f"dense stage+warm: {time.time()-t0:.1f} s", flush=True)
        t0 = time.time()
        buf = io.StringIO()
        composite.abv_search_dense(WORK, qpaths, mode=2, out=buf)
        dt = time.time() - t0
        print(f"dense mode=2: {NQ/dt:.1f} q/s", flush=True)


if __name__ == "__main__":
    main()
