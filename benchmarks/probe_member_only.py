"""True kernel-only throughput of the Pallas windowed membership kernel:
device-resident staged haystack AND pre-staged needle tiles, K chained
dispatches, ONE readback (per-dispatch readbacks through the tunnel cost
~25-30 ms and previously swamped the kernel)."""
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
NH = 12 << 20
NN = 1 << 20
K = 16

hay = np.unique(rng.integers(0, 1 << 32, NH, dtype=np.uint32))
sh = merge.StaticHaystack(hay, np.arange(hay.size, dtype=np.uint32))
hay2d, val2d = sh._stage()
W, BLOCK, LANES = merge.W, merge.BLOCK, merge.LANES
nblocks = NN // BLOCK

tiles = []
for i in range(K):
    nd = np.sort(rng.integers(0, 1 << 32, NN, dtype=np.uint32))
    anchors = nd.reshape(nblocks, BLOCK)[:, 0]
    pos = np.searchsorted(hay, anchors).astype(np.int64)
    mblk = np.minimum(pos // W, sh.nh_pad // W - 2).astype(np.int32)
    tiles.append((jax.device_put(mblk),
                  jax.device_put(nd.reshape(-1, LANES))))

m, v = merge._member_pallas(*tiles[0][:1], hay2d, val2d, tiles[0][1],
                            nblocks=nblocks)
print("warm:", int(np.asarray(m).sum()), "hits", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    outs = [merge._member_pallas(t[0], hay2d, val2d, t[1],
                                 nblocks=nblocks) for t in tiles]
    np.asarray(jnp.stack([o[0].sum() for o in outs]).sum())
    best = min(best, time.time() - t0)
print(f"member chained: {best*1000/K:.2f} ms/dispatch "
      f"({NN*K/best/1e6:.0f} Mlookups/s)", flush=True)
