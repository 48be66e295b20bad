"""Scaling / overhead accounting for the mesh paths (BASELINE.md's
"scaling efficiency" row, measured with what this environment allows).

Real multi-chip hardware is unavailable here, so three things ARE
measurable and reported:

1. CPU-mesh collective overhead: the sharded paths at n_devices in
   {1,2,4,8} virtual CPU devices on FIXED total work.  All devices
   share the same cores, so ideal scaling would hold t(N) == t(1);
   t(N)/t(1) is the pure partition+collective overhead of the mesh
   program (all_gather sketch merge, psum count reduction).
2. Multi-host overhead: the full dryrun pipelines at 1 process vs 2
   processes x 4 devices (jax.distributed over loopback DCN).
3. Real-chip n=1 mesh overhead (optional, tunnel permitting):
   sharded_sketch on a 1-device mesh vs the direct jit call on the
   same chip — what wrapping the kernel in shard_map costs.

Usage: python benchmarks/scaling_bench.py [--tpu]  (defaults to the
8-virtual-device CPU mesh; writes a markdown table to stdout).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = """
import os, sys, time, json
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from metakssd_tpu.parallel import mesh as pmesh
from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu.formats.codir import write_codir
from metakssd_tpu.formats.costat import CoStat

N = %(n)d
res = {}
rng = np.random.default_rng(0)

# --- sharded stage-I sketch: fixed 2M-window stream over the data axis
p = SketchParams(k=11, subk=6, drlevel=3)
shuf = make_shuf(p, seed=3)
codes = rng.integers(0, 4, size=2_000_000 + 2 * p.k - 1).astype(np.uint8)
m = pmesh.make_mesh(n_data=N, n_db=1)
dr = pmesh.sharded_sketch(codes, shuf, m)      # compile + warm
best = 1e9
for _ in range(3):
    t0 = time.time()
    dr2 = pmesh.sharded_sketch(codes, shuf, m)
    best = min(best, time.time() - t0)
assert np.array_equal(np.sort(dr), np.sort(dr2))
res["sketch_s"] = round(best, 4)
res["sketch_nkmer"] = int(dr.size)

# --- db-sharded search: fixed 4M-posting DB, 64 queries
nk = 1 << 19
rk = np.sort(rng.choice(np.uint32(1) << 31, nk, replace=False)
             .astype(np.uint32))
lens = rng.integers(1, 15, size=nk)
index = np.zeros(nk + 1, np.uint64)
np.cumsum(lens, out=index[1:])
gids = rng.integers(0, 512, size=int(index[-1]), dtype=np.int64)
d = %(work)r
os.makedirs(d, exist_ok=True)
db = os.path.join(d, "db")
nrefs = 512
if not os.path.exists(os.path.join(db, "cofiles.stat")):
    # build a 512-genome codir whose postings reproduce rk/gids,
    # vectorised (unique (gid, key) pairs via one lexsort); content is
    # deterministic, so the four per-N worker subprocesses share it
    keys_flat = np.repeat(rk, lens)
    order = np.lexsort((keys_flat, gids))
    gs, ks = gids[order], keys_flat[order]
    keep = np.ones(gs.size, bool)
    keep[1:] = (gs[1:] != gs[:-1]) | (ks[1:] != ks[:-1])
    gs, ks = gs[keep], ks[keep]
    gb = np.searchsorted(gs, np.arange(nrefs + 1))
    per_genome = [[(ks[gb[g]:gb[g + 1]].astype(np.uint32), None)]
                  for g in range(nrefs)]
    ctx = np.array([g[0][0].size for g in per_genome], np.uint32)
    write_codir(db, CoStat(7, False, 22, 6, 1, int(ctx.sum()), ctx,
                           [f"g{i}" for i in range(nrefs)]), per_genome)
qn = 64
q_ids = [np.sort(rng.choice(rk, 4096, replace=False)) for _ in range(qn)]
qidx = np.zeros(qn + 1, np.uint64)
np.cumsum([q.size for q in q_ids], out=qidx[1:])
qd = os.path.join(d, "q")
write_codir(qd, CoStat(7, False, 22, 6, 1, int(qidx[-1]),
                       np.array([q.size for q in q_ids], np.uint32),
                       [f"s{i}" for i in range(qn)]),
            [[(q, None)] for q in q_ids])
from metakssd_tpu.formats.codir import CoDir
qcd = CoDir.read(qd, want_abund=False)
# genome-major db-sharded path at every N (apples to apples: the
# n_db=1 default routes to the different, faster matched-row-expansion
# algorithm — measured separately below)
m2 = pmesh.make_mesh(n_data=1, n_db=N)
mat = pmesh.sharded_shared_counts(db, qcd, m2,
                                  use_data_axis=False)   # warm
best = 1e9
for _ in range(3):
    t0 = time.time()
    mat2 = pmesh.sharded_shared_counts(db, qcd, m2,
                                       use_data_axis=False)
    best = min(best, time.time() - t0)
assert np.array_equal(mat, mat2)
res["search_s"] = round(best, 4)
if N == 1:
    me = pmesh.make_mesh(n_data=1, n_db=1)
    mate = pmesh.sharded_shared_counts(db, qcd, me)      # warm
    assert np.array_equal(mat, mate)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        pmesh.sharded_shared_counts(db, qcd, me)
        best = min(best, time.time() - t0)
    res["search_expansion_s"] = round(best, 4)
print("RESULT " + json.dumps(res))
"""


def run_n(n: int, work: str):
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": f"--xla_force_host_platform_device_count={n}"})
    r = subprocess.run([sys.executable, "-c",
                        WORKER % {"repo": REPO, "n": n, "work": work}],
                       capture_output=True, text=True, env=env,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    import json
    for ln in r.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    raise RuntimeError(r.stdout[-500:])


def multihost_times():
    import tempfile
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    out = {}
    for procs in (1, 2):
        d = tempfile.mkdtemp(prefix=f"mh_scale{procs}_")
        t0 = time.time()
        ge.dryrun_multihost(nprocs=procs, ndev_per=8 // procs, workdir=d)
        out[procs] = round(time.time() - t0, 2)
        import shutil
        shutil.rmtree(d, ignore_errors=True)
    return out


def main():
    import tempfile
    work = tempfile.mkdtemp(prefix="scale_bench_")
    rows = {}
    for n in (1, 2, 4, 8):
        rows[n] = run_n(n, work)
        print(f"n={n}: {rows[n]}", flush=True)
    print()
    print("| n_devices | sharded stage-I (s) | overhead vs n=1 | "
          "db-sharded search, 64 q (s) | overhead vs n=1 |")
    print("|---|---|---|---|---|")
    for n in (1, 2, 4, 8):
        r = rows[n]
        print(f"| {n} | {r['sketch_s']} | "
              f"{r['sketch_s'] / rows[1]['sketch_s']:.2f}x | "
              f"{r['search_s']} | "
              f"{r['search_s'] / rows[1]['search_s']:.2f}x |")
    mh = multihost_times()
    print(f"\nmultihost dryrun (5 pipelines, loopback DCN): "
          f"1 proc x 8 dev = {mh[1]}s, 2 procs x 4 dev = {mh[2]}s "
          f"({mh[2] / mh[1]:.2f}x)")


if __name__ == "__main__":
    main()
