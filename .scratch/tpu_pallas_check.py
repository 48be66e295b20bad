"""Validate the Pallas sketch kernel on real TPU vs the golden host impl.

Small inputs first; prints PASS/FAIL per size. Run under timeout but with
headroom so computations finish (avoid wedging the chip).
"""
import sys
import time

import numpy as np

import jax

print("devices:", jax.devices(), flush=True)

from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.params import SketchParams
from metakssd_tpu.ops import golden, sketch_pallas

shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=7)
accept = shuf.device_tables()

rng = np.random.default_rng(42)
for size in (1 << 12, 1 << 16, 1 << 20, 1 << 22):
    codes = rng.integers(0, 4, size=size).astype(np.uint8)
    # sprinkle invalid bases
    bad = rng.integers(0, size, size=size // 500)
    codes[bad] = 255
    t0 = time.time()
    res = sketch_pallas.sketch_codes_pallas(codes, shuf, accept=accept)
    t1 = time.time()
    if res is None:
        print(f"size={size}: pallas returned None (unsupported)", flush=True)
        sys.exit(2)
    got, cnt = res
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    ok = cnt == gold.size and np.array_equal(got, gold)
    print(f"size={size}: {'PASS' if ok else 'FAIL'} "
          f"survivors={cnt} gold={gold.size} wall={t1-t0:.3f}s", flush=True)
    if not ok:
        print("got ", got[:20])
        print("gold", gold[:20])
        sys.exit(1)
print("ALL PASS", flush=True)
