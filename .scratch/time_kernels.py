"""Warm per-dispatch timing: XLA compact vs Pallas compact sketch kernels.

Inputs are pre-placed on device (fresh per rep to defeat dispatch caching);
time = host readback wall minus ~30ms tunnel roundtrip.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu.ops import sketch_xla, sketch_pallas

shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=7)
p = shuf.params
accept = shuf.device_tables()
a_tups = jnp.asarray(accept[0])
a_pf = jnp.asarray(accept[1])
a_mask = jnp.asarray(accept[2])
a2d = jnp.asarray(accept[0].reshape(-1, 128))
p2d = jnp.asarray(accept[1].reshape(-1, 128))
n_accept = accept[0].size

NWIN = 1 << 24
TL = p.kmer_len
REPS = 5
RT = 0.030  # tunnel roundtrip

rng = np.random.default_rng(1)

def readback(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])

def make_inputs():
    codes = rng.integers(0, 4, size=NWIN + TL - 1).astype(np.uint8)
    return codes

# ---- XLA compact ----
max_out = max(NWIN >> 8, 1 << 12)
times = []
for r in range(REPS + 1):
    codes = make_inputs()
    packed, vmask = sketch_xla.pack_codes(codes)
    dp, dv = jax.device_put(packed), jax.device_put(vmask)
    _ = readback(dp[:1])  # ensure arrival
    t0 = time.time()
    keys, cnt = sketch_xla._sketch_chunk_compact(
        dp, dv, a_mask, a_tups, a_pf, k=p.k, subk=p.subk,
        drlevel=p.drlevel, nwin=NWIN, max_out=max_out)
    c = int(np.asarray(cnt))
    dt = time.time() - t0 - RT
    if r:
        times.append(dt)
    print(f"xla rep{r}: {dt*1e3:.1f} ms  count={c}", flush=True)
best = min(times)
print(f"XLA compact: best {best*1e3:.1f} ms = {NWIN/best/1e6:.1f} Mwin/s",
      flush=True)

# ---- Pallas compact ----
RWIN, LANES = sketch_pallas.RWIN, sketch_pallas.LANES
nblocks = NWIN // (RWIN * LANES)
ext = sketch_pallas._ext(TL)
times = []
for r in range(REPS + 1):
    codes = make_inputs()
    c32 = codes.astype(np.int32)
    tiles = sketch_pallas._restructure(jnp.asarray(c32), nblocks=nblocks,
                                       TL=TL)
    _ = readback(tiles[:1, :1, :1])
    t0 = time.time()
    surv, counts = sketch_pallas.sketch_tiles_compact_pallas(
        tiles, a2d, p2d, k=p.k, subk=p.subk, drlevel=p.drlevel,
        nblocks=nblocks, n_accept=n_accept)
    cs = np.asarray(counts)
    dt = time.time() - t0 - RT
    if r:
        times.append(dt)
    print(f"pallas rep{r}: {dt*1e3:.1f} ms  total={cs.sum()}", flush=True)
best = min(times)
print(f"Pallas compact: best {best*1e3:.1f} ms = {NWIN/best/1e6:.1f} Mwin/s",
      flush=True)

# ---- Pallas window-only (no compaction) ----
times = []
for r in range(REPS + 1):
    codes = make_inputs()
    tiles = sketch_pallas._restructure(jnp.asarray(codes.astype(np.int32)),
                                       nblocks=nblocks, TL=TL)
    _ = readback(tiles[:1, :1, :1])
    t0 = time.time()
    dr, keep = sketch_pallas.sketch_tiles_pallas(
        tiles, a2d, p2d, k=p.k, subk=p.subk, drlevel=p.drlevel,
        nblocks=nblocks, n_accept=n_accept)
    s = int(np.asarray(jnp.sum(keep)))
    dt = time.time() - t0 - RT
    if r:
        times.append(dt)
    print(f"pallas-win rep{r}: {dt*1e3:.1f} ms  keep={s}", flush=True)
best = min(times)
print(f"Pallas window-only: best {best*1e3:.1f} ms = "
      f"{NWIN/best/1e6:.1f} Mwin/s", flush=True)
