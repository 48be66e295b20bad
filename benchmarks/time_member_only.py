"""Kernel-only throughput for the Pallas windowed membership kernel
(device-resident staged haystack, chained dispatches)."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metakssd_tpu.ops import merge  # noqa: E402

rng = np.random.default_rng(0)
NH = 4 << 20                 # 4.2M-entry haystack
NN = 1 << 20                 # 1M needles per dispatch
K = 4

hay = np.unique(rng.integers(0, 1 << 32, NH, dtype=np.uint32))
vals = np.arange(hay.size, dtype=np.uint32)
sh = merge.StaticHaystack(hay, vals)
needles = [np.sort(rng.integers(0, 1 << 32, NN, dtype=np.uint32))
           for _ in range(K)]
# pre-stage device-resident padded needle tiles like sorted_membership does
nd2d = []
mblks = []
sh._stage()
W, BLOCK, LANES = merge.W, merge.BLOCK, merge.LANES
for nd in needles:
    npad = -(-nd.size // BLOCK) * BLOCK
    pad = np.full(npad, merge.UINT32_MAX, np.uint32)
    pad[:nd.size] = nd
    nd2d.append(jax.device_put(pad.reshape(-1, LANES)))
    # window index per block: first haystack window whose max >= block min
    hay_pad = sh.hay_pad if hasattr(sh, "hay_pad") else None
    mblks.append(None)

# use the public path once to warm + get correctness, then time the jitted fn
m, v = merge.sorted_membership(sh, None, needles[0])
print("warm ok,", int(m.sum()), "hits")
best = float("inf")
for rep in range(3):
    t0 = time.time()
    outs = [merge.sorted_membership(sh, None, needles[i]) for i in range(K)]
    dt = time.time() - t0
    best = min(best, dt)
    print(f"  rep{rep}: {dt*1000/K:.0f} ms/query ({NN*K/dt/1e6:.1f} Mlkp/s "
          f"end-to-end incl. host pre/post)", flush=True)
