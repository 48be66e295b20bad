"""Break down the fastq sketch e2e path stage by stage."""
import time
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
fq = os.path.join(REPO, ".bench_cache", "sample_200000.fq")
shufp = os.path.join(REPO, ".bench_cache", "bench_l3k11.shuf")

from metakssd_tpu.formats.shuf import read_shuf
from metakssd_tpu.io import seqio
from metakssd_tpu.ops import sketch_xla, sketch_pallas

shuf = read_shuf(shufp)
accept = shuf.device_tables()
p = shuf.params

# warm
w = np.full(1 << 16, 1, dtype=np.uint8)
sketch_xla.sketch_to_sets(w, shuf, mode="koc", accept=accept)

for rep in range(3):
    t0 = time.time()
    codes, _ = seqio.fastq_to_codes(fq, min_qual=0)
    t1 = time.time()
    dr = sketch_xla.sketch_codes(codes, shuf, accept=accept)
    t2 = time.time()
    uniq, counts = np.unique(dr, return_counts=True)
    t3 = time.time()
    print(f"rep{rep}: parse {t1-t0:.3f}s  sketch {t2-t1:.3f}s "
          f"(codes={codes.size}) unique {t3-t2:.3f}s  n={uniq.size}",
          flush=True)

# pallas path share: time pack vs dispatch inside
t0 = time.time()
packed, vmask = sketch_xla.pack_codes(codes)
t1 = time.time()
print(f"pack_codes alone: {t1-t0:.3f}s for {codes.size} bases", flush=True)
