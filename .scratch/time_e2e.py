"""End-to-end sketch timing (host pack + h2d + kernel + d2h) on TPU."""
import time
import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu.ops import sketch_xla, sketch_pallas, golden

shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=7)
accept = shuf.device_tables()
N = 1 << 25  # 33.5M bases (one max-bucket dispatch)
REPS = 4
rng = np.random.default_rng(2)

# warm both paths
w = rng.integers(0, 4, size=N).astype(np.uint8)
r1 = sketch_pallas.sketch_codes_pallas(w, shuf, accept=accept)
r2 = sketch_xla.sketch_codes(w, shuf, accept=accept)
import os
os.environ["MKSSD_PALLAS"] = "0"
print("warm done", r1[1], r2.size, flush=True)

for name, fn in (
    ("pallas", lambda c: sketch_pallas.sketch_codes_pallas(
        c, shuf, accept=accept)[0]),
    ("xla", lambda c: sketch_xla.sketch_codes(c, shuf, accept=accept)),
):
    times = []
    for r in range(REPS):
        codes = rng.integers(0, 4, size=N).astype(np.uint8)
        t0 = time.time()
        out = fn(codes)
        dt = time.time() - t0
        times.append(dt)
        print(f"{name} rep{r}: {dt*1e3:.0f} ms n={out.size}", flush=True)
    best = min(times)
    print(f"{name}: best {best*1e3:.0f} ms = {N/best/1e6:.1f} Mbase/s",
          flush=True)

# cross-check equality on last input
a = sketch_pallas.sketch_codes_pallas(codes, shuf, accept=accept)[0]
b = sketch_xla.sketch_codes(codes, shuf, accept=accept).astype(np.uint32)
print("equal:", np.array_equal(a, b), flush=True)
