"""Time the sketch kernels (XLA compact vs Pallas) and the membership
kernel on the real TPU.  Fresh inputs per rep (tunnel caches identical
dispatches); wall time includes h2d + compute + readback.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)

from metakssd_tpu.params import SketchParams  # noqa: E402
from metakssd_tpu.formats.shuf import make_shuf  # noqa: E402
from metakssd_tpu.ops import sketch_xla, sketch_pallas, golden  # noqa: E402
from metakssd_tpu.ops import merge as merge_ops  # noqa: E402

NB = int(os.environ.get("NB", 1 << 24))  # bases
REPS = int(os.environ.get("REPS", 3))

shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=1234)
accept = shuf.device_tables()
rng = np.random.default_rng(0)


def fresh_codes(i):
    return rng.integers(0, 4, size=NB).astype(np.uint8)


def timeit(name, fn, check=None):
    best = float("inf")
    out = None
    for i in range(REPS):
        codes = fresh_codes(i)
        t0 = time.time()
        out = fn(codes)
        dt = time.time() - t0
        best = min(best, dt)
        nwin = NB - 2 * 11 + 1
        print(f"  {name} rep{i}: {dt*1000:.0f} ms "
              f"({nwin/dt/1e6:.1f} Mwin/s)", flush=True)
        if check is not None:
            check(codes, out)
    return best


def xla_path(codes):
    os.environ["MKSSD_PALLAS"] = "0"
    return sketch_xla.sketch_codes(codes, shuf, accept=accept)


def pallas_path(codes):
    r = sketch_pallas.sketch_codes_pallas(codes, shuf, accept=accept)
    assert r is not None
    return r[0]


def pallas_nocompact(codes):
    r = sketch_pallas.sketch_codes_pallas(codes, shuf, accept=accept,
                                          compact=False)
    assert r is not None
    return r[0]


# correctness cross-check on a smaller stream first
small = rng.integers(0, 4, size=1 << 20).astype(np.uint8)
print("cross-check 1M bases...", flush=True)
t0 = time.time()
gold = np.sort(golden.window_drtuples(small, shuf)).astype(np.uint32)
print(f"  golden: {time.time()-t0:.1f}s, {gold.size} survivors", flush=True)
os.environ["MKSSD_PALLAS"] = "0"
x = sketch_xla.sketch_codes(small, shuf, accept=accept).astype(np.uint32)
assert np.array_equal(x, gold), "XLA mismatch"
print("  XLA ok", flush=True)
p = pallas_path(small).astype(np.uint32)
assert np.array_equal(p, gold), f"PALLAS mismatch {p.size} vs {gold.size}"
print("  Pallas compact ok", flush=True)
pn = pallas_nocompact(small).astype(np.uint32)
assert np.array_equal(pn, gold), "PALLAS nocompact mismatch"
print("  Pallas full-output ok", flush=True)

print(f"timing {NB/1e6:.0f}M windows, {REPS} reps", flush=True)
t_x = timeit("xla_compact", xla_path)
t_p = timeit("pallas_compact", pallas_path)
t_pn = timeit("pallas_full", pallas_nocompact)

nwin = NB - 2 * 11 + 1
print(f"RESULT xla {nwin/t_x/1e6:.1f} Mwin/s | pallas {nwin/t_p/1e6:.1f} "
      f"| pallas_full {nwin/t_pn/1e6:.1f}", flush=True)

# ---- membership kernel ----
NH = 1 << 22
NN = 1 << 20
hay = np.sort(rng.choice(np.uint32(1) << 31, NH, replace=False).astype(np.uint32))
vals = np.arange(NH, dtype=np.uint32)
sh = merge_ops.StaticHaystack(hay, vals)

for name, use_pallas in (("member_host", False), ("member_pallas", True)):
    best = float("inf")
    for i in range(REPS):
        needles = np.sort(rng.choice(np.uint32(1) << 31, NN,
                                     replace=False).astype(np.uint32))
        t0 = time.time()
        m, v = merge_ops.sorted_membership(sh, None, needles,
                                           use_pallas=use_pallas)
        dt = time.time() - t0
        best = min(best, dt)
        print(f"  {name} rep{i}: {dt*1000:.0f} ms ({NN/dt/1e6:.1f} Mlkp/s), "
              f"{int(m.sum())} hits", flush=True)
        if i == 0:
            pos = np.searchsorted(hay, needles)
            pos = np.minimum(pos, hay.size - 1)
            mm = hay[pos] == needles
            assert np.array_equal(m, mm), "membership mismatch"
            assert np.array_equal(v[m], vals[pos[mm]]), "value mismatch"
    print(f"RESULT {name} {NN/best/1e6:.1f} Mlkp/s", flush=True)
