#!/usr/bin/env python
"""Benchmark: metagenome sketching throughput (the per-sample hot path,
reference call stack §3.1) vs the reference C binary on the same input.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = our reads/s divided by the reference binary's reads/s on
the identical fastq + shuffle (reference built from /root/reference when
available; vs_baseline = 0.0 if it cannot be built).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_cache")

N_READS = int(os.environ.get("MKSSD_BENCH_READS", 200_000))
READ_LEN = 100


def _prepare():
    os.makedirs(CACHE, exist_ok=True)
    fq = os.path.join(CACHE, f"sample_{N_READS}.fq")
    shufp = os.path.join(CACHE, "bench_l3k11.shuf")
    from metakssd_tpu.params import SketchParams
    from metakssd_tpu.formats.shuf import make_shuf, write_shuf, read_shuf
    if not os.path.exists(shufp):
        write_shuf(shufp, make_shuf(SketchParams(k=11, subk=6, drlevel=3),
                                    seed=1234))
    if not os.path.exists(fq):
        rng = np.random.default_rng(7)
        genome = rng.integers(0, 4, size=2_000_000)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)[genome]
        starts = rng.integers(0, genome.size - READ_LEN, size=N_READS)
        with open(fq, "w") as f:
            qual = "I" * READ_LEN
            for i, s in enumerate(starts):
                seq = bases[s:s + READ_LEN].tobytes().decode()
                f.write(f"@r{i}\n{seq}\n+\n{qual}\n")
    return fq, shufp


def _bench_reference(fq: str, shufp: str) -> float:
    """Reference reads/s (0.0 if oracle unavailable)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from tests import oracle
    except ImportError:
        import oracle  # type: ignore
    binpath = oracle.ensure_oracle()
    if not binpath:
        return 0.0
    out = os.path.join(CACHE, "ref_out")
    best = float("inf")
    for _ in range(int(os.environ.get("MKSSD_BENCH_REPS", 3))):
        subprocess.run(["rm", "-rf", out])
        t0 = time.time()
        r = subprocess.run([binpath, "dist", "-L", shufp, "-A", "-o", out,
                            fq], capture_output=True)
        dt = time.time() - t0
        if r.returncode != 0:
            return 0.0
        best = min(best, dt)
    return N_READS / best


def _bench_ours(fq: str, shufp: str) -> float:
    import jax
    from metakssd_tpu.formats.shuf import read_shuf
    from metakssd_tpu.io import seqio
    from metakssd_tpu.ops import sketch_xla
    from metakssd_tpu import pipeline

    shuf = read_shuf(shufp)
    accept = shuf.device_tables()
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from metakssd_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(n_data=n_dev, n_db=1)

    def sketch(codes):
        if mesh is not None:
            from metakssd_tpu.parallel import mesh as pmesh
            dr = pmesh.sharded_sketch(codes, shuf, mesh)
            uniq, counts = np.unique(dr, return_counts=True)
            p = shuf.params
            counts = np.minimum(counts, 0xFFFF).astype(np.uint16)
            comp = (uniq % np.uint64(p.component_num)).astype(np.int64)
            ids = (uniq >> np.uint64(p.comp_code_bits)).astype(np.uint32)
            return [(ids[comp == ci], counts[comp == ci])
                    for ci in range(p.component_num)]
        return sketch_xla.sketch_to_sets(codes, shuf, mode="koc",
                                         accept=accept)

    # warmup: compile the kernel shapes on a small prefix
    codes_w = np.full(1 << 16, 1, dtype=np.uint8)
    sketch(codes_w)

    out = os.path.join(CACHE, "mine_out")
    t0 = time.time()
    codes, _ = seqio.fastq_to_codes(fq, min_qual=0)
    sets = sketch(codes)
    # write the sketch dir (part of the end-to-end path)
    from metakssd_tpu.formats.costat import CoStat
    from metakssd_tpu.formats.codir import write_codir
    p = shuf.params
    ctx = np.array([sum(s[0].size for s in sets)], dtype=np.uint32)
    stat = CoStat(p.shuf_id, True, 2 * p.k, 2 * p.drlevel,
                  p.component_num, int(ctx.sum()), ctx, [fq])
    write_codir(out, stat, [sets])
    dt = time.time() - t0
    return N_READS / dt


def _device_healthy(timeout_s: int = 90) -> bool:
    """Probe device execution in a subprocess (a wedged TPU tunnel hangs
    forever; the bench must always print its JSON line)."""
    code = ("import jax, jax.numpy as jnp;"
            "print(int(jnp.arange(8).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0 and b"28" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if not _device_healthy():
        import jax
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        print("bench: device unhealthy, falling back to CPU",
              file=sys.stderr)
    fq, shufp = _prepare()
    ref_rps = _bench_reference(fq, shufp)
    best = 0.0
    for _ in range(int(os.environ.get("MKSSD_BENCH_REPS", 3))):
        best = max(best, _bench_ours(fq, shufp))
    print(json.dumps({
        "metric": "fastq_sketch_reads_per_s",
        "value": round(best, 1),
        "unit": "reads/s",
        "vs_baseline": round(best / ref_rps, 3) if ref_rps else 0.0,
    }))


if __name__ == "__main__":
    main()
