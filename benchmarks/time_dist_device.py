"""Device shared-count reduction on real TPU: the matched-row-expansion
step (_expansion_shared_counts) vs the posting-sweep step, same
synthetic ref/query artifacts."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from metakssd_tpu.formats.codir import CoDir, write_codir  # noqa: E402
from metakssd_tpu.formats.costat import CoStat  # noqa: E402
from metakssd_tpu.parallel import mesh as pmesh  # noqa: E402

rng = np.random.default_rng(0)
NREF = int(os.environ.get("NREF", 2048))
IDS = int(os.environ.get("IDS", 20000))
NQRY = 8
WORK = "/tmp/dist_device_bench"

refdir = os.path.join(WORK, "ref")
qrydir = os.path.join(WORK, "qry")
if not os.path.exists(os.path.join(refdir, "cofiles.stat")):
    per_genome = []
    for i in range(NREF):
        ids = np.unique(rng.integers(0, 1 << 32, IDS, dtype=np.uint32))
        per_genome.append([(ids, None)])
    ctx = np.array([g[0][0].size for g in per_genome], np.uint32)
    stat = CoStat(1, False, 16, 4, 1, int(ctx.sum()), ctx,
                  [f"g{i}" for i in range(NREF)])
    write_codir(refdir, stat, per_genome)
    allids = np.concatenate([g[0][0] for g in per_genome])
    per_q = []
    for i in range(NQRY):
        mix = rng.choice(allids, 60000)
        own = rng.integers(0, 1 << 32, 20000, dtype=np.uint32)
        ids = np.sort(np.concatenate([mix, own]).astype(np.uint32))
        per_q.append([(ids, None)])
    qctx = np.array([g[0][0].size for g in per_q], np.uint32)
    qstat = CoStat(1, False, 16, 4, 1, int(qctx.sum()), qctx,
                   [f"q{i}" for i in range(NQRY)])
    write_codir(qrydir, qstat, per_q)

ref = CoDir.read(refdir, want_abund=False)
qry = CoDir.read(qrydir, want_abund=False)
print(f"ref: {NREF} genomes x {IDS} ids "
      f"({ref.index[0][-1]} postings); {NQRY} queries", flush=True)

m1 = pmesh.make_mesh(n_data=1, n_db=1)
t0 = time.time()
a = pmesh._expansion_shared_counts(ref, qry, m1)
warm = time.time() - t0
t0 = time.time()
a = pmesh._expansion_shared_counts(ref, qry, m1)
dt_fast = time.time() - t0
print(f"expansion step: {dt_fast*1000/NQRY:.1f} ms/query "
      f"(warm incl. staging {warm:.1f} s)", flush=True)

if os.environ.get("SWEEP") == "1":
    t0 = time.time()
    b = pmesh.sharded_shared_counts(ref, qry, m1, use_data_axis=False)
    warm = time.time() - t0
    t0 = time.time()
    b = pmesh.sharded_shared_counts(ref, qry, m1, use_data_axis=False)
    dt_slow = time.time() - t0
    print(f"posting-sweep step: {dt_slow*1000/NQRY:.1f} ms/query "
          f"(warm {warm:.1f} s); identical: {np.array_equal(a, b)}",
          flush=True)
