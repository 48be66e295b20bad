"""Compact-kernel-only throughput sweep (RWIN/CSLOT via env)."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

from metakssd_tpu.params import SketchParams  # noqa: E402
from metakssd_tpu.formats.shuf import make_shuf  # noqa: E402
from metakssd_tpu.ops import sketch_xla, sketch_pallas  # noqa: E402

shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=1234)
p = shuf.params
a_tups, a_pf, _ = shuf.device_tables()
rng = np.random.default_rng(0)

BW = sketch_pallas.RWIN * sketch_pallas.LANES
NWIN = 1 << 24                      # 16.7M windows regardless of RWIN
NBLOCKS = NWIN // BW
TL = p.kmer_len
K = 4

codes = rng.integers(0, 4, size=NWIN + TL - 1).astype(np.uint8)
packed, vmask = sketch_xla.pack_codes(
    np.concatenate([codes, np.full(sketch_pallas.RWIN +
                                   sketch_pallas._ext(TL), 255, np.uint8)]))
need = NWIN + sketch_pallas.RWIN + sketch_pallas._ext(TL)
tiles = sketch_pallas._restructure_packed(jax.device_put(packed),
                                          jax.device_put(vmask),
                                          nblocks=NBLOCKS, TL=TL, n=need)
tiles = jax.block_until_ready(tiles)
a2d = jax.device_put(np.asarray(a_tups).reshape(-1, 128))
p2d = jax.device_put(np.asarray(a_pf).reshape(-1, 128))
lev2d = jax.device_put(sketch_pallas._bfs_levels(np.asarray(a_tups)))

use_bfs, pack, use_sig = sketch_pallas.kernel_modes(p, a_tups.size)
sig2d = jax.device_put(sketch_pallas._sig_tables(np.asarray(a_tups))) \
    if use_sig else None
kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nblocks=NBLOCKS,
          n_accept=a_tups.size, use_bfs=use_bfs, pack=pack,
          use_sig=use_sig)
fn = lambda t: sketch_pallas.sketch_tiles_compact_pallas(  # noqa: E731
    t, a2d, p2d, lev2d, sig2d, **kw)
vary = [jax.block_until_ready(tiles ^ i) for i in range(K)]
out, _dims, _poss, cnt = fn(vary[0])
np.asarray(cnt)                      # warm compile + execute
print(f"RWIN={sketch_pallas.RWIN} CSLOT={sketch_pallas.CSLOT} "
      f"nblocks={NBLOCKS} survivors={int(np.asarray(cnt).sum())}",
      flush=True)
best = float("inf")
for rep in range(3):
    t0 = time.time()
    outs = [fn(vary[i]) for i in range(K)]
    for o in outs:
        np.asarray(o[3])
    dt = time.time() - t0
    best = min(best, dt)
    print(f"  rep{rep}: {dt*1000/K:.1f} ms/dispatch "
          f"({NWIN*K/dt/1e6:.0f} Mwin/s)", flush=True)
