"""Chained-dispatch measurement of the XLA compact sketch kernel
(`sketch_xla._sketch_chunk_compact`) — the round-2 PERF table's
75 Mwin/s number was a per-dispatch readback through the tunnel
(~25-30 ms latency), not the kernel.  K dispatches, ONE readback,
fresh inputs per rep (same methodology as probe_kernel_cost.py)."""
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
from metakssd_tpu.ops import sketch_xla  # noqa: E402

shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=1234)
p = shuf.params
a_tups, a_pf, a_mask = shuf.device_tables()
rng = np.random.default_rng(0)

NWIN = 1 << 24
TL = p.kmer_len
K = 16
MAX_OUT = 1 << 14

codes = rng.integers(0, 4, size=NWIN + TL - 1).astype(np.uint8)
packed, vmask = sketch_xla.pack_codes(codes)
pk = jax.block_until_ready(jax.device_put(packed))
vm = jax.block_until_ready(jax.device_put(vmask))
am = jax.device_put(a_mask)
at = jax.device_put(a_tups)
pf = jax.device_put(a_pf)

kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nwin=NWIN,
          max_out=MAX_OUT)


@jax.jit
def fn(pk_i):
    dr, cnt = sketch_xla._sketch_chunk_compact(pk_i, vm, am, at, pf,
                                               **kw)
    return jnp.sum(dr.astype(jnp.int32)) + cnt


vary = [jax.block_until_ready(pk ^ np.uint32(i)) for i in range(K)]
np.asarray(fn(vary[0]))                            # warm compile
best = float("inf")
for _ in range(3):
    t0 = time.time()
    outs = [fn(v) for v in vary]
    np.asarray(jnp.stack(outs).sum())
    best = min(best, time.time() - t0)
print(f"XLA compact kernel, chained: {best * 1000 / K:7.2f} ms/dispatch"
      f" ({NWIN * K / best / 1e6:5.0f} Mwin/s)")
