"""Kernel-only throughput (device-resident inputs, chained dispatches)
for the Pallas compact kernel and the XLA compact kernel."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metakssd_tpu.params import SketchParams  # noqa: E402
from metakssd_tpu.formats.shuf import make_shuf  # noqa: E402
from metakssd_tpu.ops import sketch_xla, sketch_pallas  # noqa: E402

shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=1234)
p = shuf.params
accept = shuf.device_tables()
a_tups, a_pf, a_mask = accept
rng = np.random.default_rng(0)

NBLOCKS = 256                       # 16.7M windows
BW = sketch_pallas.RWIN * sketch_pallas.LANES
NWIN = NBLOCKS * BW
TL = p.kmer_len
K = 4                               # chained dispatches per timing

codes = rng.integers(0, 4, size=NWIN + TL - 1).astype(np.uint8)
packed, vmask = sketch_xla.pack_codes(
    np.concatenate([codes, np.full(sketch_pallas.RWIN +
                                   sketch_pallas._ext(TL), 255, np.uint8)]))
packed_d = jax.device_put(packed)
vmask_d = jax.device_put(vmask)
need = NWIN + sketch_pallas.RWIN + sketch_pallas._ext(TL)
tiles = sketch_pallas._restructure_packed(packed_d, vmask_d,
                                          nblocks=NBLOCKS, TL=TL, n=need)
tiles = jax.block_until_ready(tiles)
a2d = jax.device_put(np.asarray(a_tups).reshape(-1, 128))
p2d = jax.device_put(np.asarray(a_pf).reshape(-1, 128))
lev2d = jax.device_put(sketch_pallas._bfs_levels(np.asarray(a_tups)))
amask_d = jax.device_put(np.asarray(a_mask))
atups_d = jax.device_put(np.asarray(a_tups))
apf_d = jax.device_put(np.asarray(a_pf))

kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nblocks=NBLOCKS,
          n_accept=a_tups.size, use_bfs=True)


def time_chain(name, fn):
    # warm
    np.asarray(fn(0)[1] if isinstance(fn(0), tuple) else fn(0))
    for rep in range(3):
        t0 = time.time()
        outs = [fn(i) for i in range(K)]
        for o in outs:
            r = o[-1] if isinstance(o, tuple) else o
            np.asarray(r)
        dt = time.time() - t0
        print(f"  {name} rep{rep}: {dt*1000/K:.0f} ms/dispatch "
              f"({NWIN*K/dt/1e6:.0f} Mwin/s)", flush=True)


# vary a scalar input to defeat dispatch caching: xor tiles with i
vary = [jax.block_until_ready(tiles ^ i) for i in range(K)]

time_chain("pallas_compact_bfs",
           lambda i: sketch_pallas.sketch_tiles_compact_pallas(
               vary[i], a2d, p2d, lev2d, pack=True, **kw))
time_chain("pallas_compact_oldsearch",
           lambda i: sketch_pallas.sketch_tiles_compact_pallas(
               vary[i], a2d, p2d, lev2d, pack=False,
               **{**kw, "use_bfs": False}))
time_chain("pallas_window_bfs",
           lambda i: sketch_pallas.sketch_tiles_pallas(
               vary[i], a2d, p2d, lev2d, **kw))

# XLA compact kernel from device-resident packed input
pk = [jax.block_until_ready(packed_d ^ np.uint32(i)) for i in range(K)]
max_out = max(NWIN >> 8, 1 << 12)


def xla_fn(i):
    return sketch_xla._sketch_chunk_compact(
        pk[i], vmask_d, amask_d, atups_d, apf_d, k=p.k, subk=p.subk,
        drlevel=p.drlevel, nwin=NWIN, max_out=max_out)


time_chain("xla_compact", xla_fn)
print("done", flush=True)
