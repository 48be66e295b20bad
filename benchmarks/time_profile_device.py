"""Device profiling reduction (ops/profile_device.py) on real TPU:
per-query latency through the tunnel (2 dispatches + 1 counts readback)
and chained pass-1 throughput (the colocated-bound kernel cost)."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metakssd_tpu.ops.profile_device import DeviceProfileIndex  # noqa: E402

rng = np.random.default_rng(0)
NREF = int(os.environ.get("NREF", 4096))
IDS = int(os.environ.get("IDS", 3000))
NQ = 60_000
K = 8

rk = np.unique(rng.integers(0, 1 << 32, NREF * IDS, dtype=np.uint32))
lens = rng.integers(1, 7, rk.size)
starts = np.zeros(rk.size + 1, np.int64)
np.cumsum(lens, out=starts[1:])
gid = rng.integers(0, NREF, int(lens.sum())).astype(np.int32)
print(f"nref={NREF} distinct_kmers={rk.size} postings={gid.size}",
      flush=True)

t0 = time.time()
idx = DeviceProfileIndex([(rk, starts, gid)], NREF)
print(f"stage: {time.time()-t0:.2f} s", flush=True)

queries = []
for i in range(K):
    q = np.unique(rng.choice(rk, NQ))
    a = rng.integers(1, 200, q.size).astype(np.uint16)
    queries.append((q, a))

# end-to-end per query (both passes + readbacks)
stats = idx.group_stats([queries[0]], 0.98, 0.99)   # warm compile
best = float("inf")
for _ in range(3):
    t0 = time.time()
    for q, a in queries:
        idx.group_stats([(q, a)], 0.98, 0.99)
    best = min(best, time.time() - t0)
print(f"e2e group_stats: {best*1000/K:.1f} ms/query "
      f"({K/best:.1f} q/s)", flush=True)
