"""Validate + time the merge-path membership kernel on real TPU."""
import time
import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from metakssd_tpu.ops import merge

rng = np.random.default_rng(5)

for nh, nn in ((1 << 20, 1 << 18), (1 << 24, 1 << 22)):
    hay = np.unique(rng.integers(0, 1 << 32, size=nh, dtype=np.uint64)
                    .astype(np.uint32))
    vals = rng.integers(0, 1 << 16, size=hay.size).astype(np.uint32)
    needles = np.sort(np.concatenate([
        rng.choice(hay, size=nn // 2, replace=False),
        rng.integers(0, 1 << 32, size=nn // 2, dtype=np.uint64)
        .astype(np.uint32)]))
    t0 = time.time()
    m, v = merge.sorted_membership(hay, vals, needles, use_pallas=True)
    t1 = time.time()
    gm, gv = merge.sorted_membership(hay, vals, needles, use_pallas=False)
    ok = np.array_equal(m, gm) and np.array_equal(v, gv)
    print(f"nh={nh} nn={nn}: {'PASS' if ok else 'FAIL'} "
          f"hits={m.sum()} wall={t1-t0:.3f}s", flush=True)
    if not ok:
        bad = np.nonzero(m != gm)[0][:10]
        print("mismatch idx", bad, needles[bad])
        raise SystemExit(1)

# warm timing, fresh needles each rep
nh, nn = 1 << 24, 1 << 22
hay = np.unique(rng.integers(0, 1 << 32, size=nh, dtype=np.uint64)
                .astype(np.uint32))
vals = rng.integers(0, 1 << 16, size=hay.size).astype(np.uint32)
times = []
for r in range(4):
    needles = np.sort(rng.integers(0, 1 << 32, size=nn, dtype=np.uint64)
                      .astype(np.uint32))
    t0 = time.time()
    m, v = merge.sorted_membership(hay, vals, needles, use_pallas=True)
    dt = time.time() - t0
    times.append(dt)
    print(f"rep{r}: {dt*1e3:.1f} ms", flush=True)
best = min(times)
print(f"merge membership: best {best*1e3:.1f} ms = "
      f"{nn/best/1e6:.1f} Mneedles/s", flush=True)
