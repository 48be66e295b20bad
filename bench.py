#!/usr/bin/env python
"""Benchmark: metagenome sketching throughput (the per-sample hot path,
reference call stack SURVEY §3.1) vs the reference C binary on the same
input, plus profile-latency and abv-search throughput extras.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

vs_baseline = our reads/s divided by the reference binary's reads/s on
the identical fastq + shuffle (reference built from /root/reference when
available; vs_baseline = 0.0 if it cannot be built).

Wedge-proofing (a killed in-flight dispatch can hang the remote TPU for
hours; the bench must always print its line):
  * every measurement that may touch the device runs in a *subprocess*
    under a timeout generous enough to let in-flight work finish;
  * the main process never imports jax;
  * on any device failure the subprocess is re-run with JAX_PLATFORMS
    pinned to cpu, where sketching uses the native OpenMP engine
    (native/sketch_cpu.cpp) — itself several times faster than the
    reference binary.
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
REPS = int(os.environ.get("MKSSD_BENCH_REPS", 3))
WORKER_TIMEOUT = int(os.environ.get("MKSSD_BENCH_TIMEOUT", 1500))


# --------------------------------------------------------------------------
# input preparation (main process; no jax)
# --------------------------------------------------------------------------

def _prepare():
    os.makedirs(CACHE, exist_ok=True)
    fq = os.path.join(CACHE, f"sample_{N_READS}.fq")
    shufp = os.path.join(CACHE, "bench_l3k11.shuf")
    from metakssd_tpu.params import SketchParams
    from metakssd_tpu.formats.shuf import make_shuf, write_shuf
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


def _oracle_bin():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from tests import oracle
    except ImportError:
        import oracle  # type: ignore
    return oracle.ensure_oracle()


def _bench_reference(fq: str, shufp: str) -> float:
    """Reference reads/s (0.0 if oracle unavailable)."""
    binpath = _oracle_bin()
    if not binpath:
        return 0.0
    out = os.path.join(CACHE, "ref_out")
    # warm the page cache (the 64 MB shuffle dominates a cold run) and
    # give the binary one untimed run — both sides then measure warm
    for p in (fq, shufp):
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    subprocess.run(["rm", "-rf", out])
    subprocess.run([binpath, "dist", "-L", shufp, "-A", "-o", out, fq],
                   capture_output=True)
    best = float("inf")
    for _ in range(REPS):
        subprocess.run(["rm", "-rf", out])
        t0 = time.time()
        r = subprocess.run([binpath, "dist", "-L", shufp, "-A", "-o", out,
                            fq], capture_output=True)
        dt = time.time() - t0
        if r.returncode != 0:
            return 0.0
        best = min(best, dt)
    return N_READS / best


# --------------------------------------------------------------------------
# our measurements (worker subprocess; may touch the device)
# --------------------------------------------------------------------------

def _worker_sketch(fq: str, shufp: str, backend: str) -> float:
    """Time the REAL product path (pipeline.run_stage1: stream-parse ->
    sketch -> unique/count -> write combco artifacts), matching what the
    reference binary's timed `dist -L -A -o` run produces."""
    os.environ["MKSSD_BACKEND"] = backend
    import shutil
    from metakssd_tpu.formats.shuf import read_shuf
    from metakssd_tpu import pipeline
    from metakssd_tpu.ops import sketch_xla

    shuf = read_shuf(shufp)
    accept = shuf.device_tables()
    opts = pipeline.SketchOptions(abundance=True)

    def run_once():
        out = os.path.join(CACHE, f"mine_out_{backend}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        pipeline.run_stage1([fq], shuf, out, opts)
        return time.time() - t0

    if backend == "tpu":
        # warm up compiled shapes on a small prefix (persistent-cache hit
        # after the first ever run)
        codes_w = np.full(1 << 16, 1, dtype=np.uint8)
        sketch_xla.sketch_to_sets(codes_w, shuf, mode="koc", accept=accept)
    best = min(run_once() for _ in range(REPS))
    return N_READS / best


def _worker_kernel() -> dict:
    """Chained-dispatch kernel-only throughput of the Pallas compact
    sketch kernel, via the shared harness (ops/kernel_bench.py — same
    methodology as the PERF.md probes, product-path auto-detected
    kernel configuration).  Only invoked when the device probe
    passed."""
    from metakssd_tpu.ops.kernel_bench import kernel_chain_mwin
    return {"kernel_mwin_per_s": kernel_chain_mwin()}


def _worker_e2e(backend: str) -> dict:
    """Whole-workflow latency: fastq -> sketch -A -> composite profile
    -> poisson as ONE measured flow (profile_e2e.profile_fastq), with
    the per-stage budget; oracle baseline = its dist -A + composite on
    the identical inputs (the reference's poisson step is a perl
    one-liner outside the binary — negligible and uncounted on both
    sides)."""
    import shutil

    os.environ["MKSSD_BACKEND"] = backend
    dbdir, _, shufp = _profile_fixture()
    fq, _ = _prepare()
    from metakssd_tpu import composite, profile_e2e
    outdir = os.path.join(CACHE, "e2e_out")

    def _run(cold: bool):
        shutil.rmtree(outdir, ignore_errors=True)
        # drop the in-process index cache every rep — a real second CLI
        # invocation starts a fresh process (comparing a cached rep
        # against the always-cold oracle would inflate the ratio)
        composite._COMP_CACHE.clear()
        if cold:
            composite.wait_staging()
            shutil.rmtree(os.path.join(dbdir, ".mkssd_stage"),
                          ignore_errors=True)
        return profile_e2e.profile_fastq([fq], dbdir, shufp, outdir)

    cold_rep = _run(cold=True)        # first-contact: no sidecars
    best = None
    for _ in range(REPS):             # steady state: sidecars on disk
        rep = _run(cold=False)
        if best is None or rep["total_s"] < best["total_s"]:
            best = rep
    composite.wait_staging()
    res = {"e2e_total_s": best["total_s"],
           "e2e_cold_total_s": cold_rep["total_s"],
           "e2e_stages": {k: v for k, v in best["stages"].items()
                          if k.startswith("e2e.")}}
    binpath = _oracle_bin()
    if binpath:
        out = os.path.join(CACHE, "e2e_ref_co")
        ref_best = float("inf")
        for _ in range(REPS):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            r1 = subprocess.run([binpath, "dist", "-L", shufp, "-A",
                                 "-o", out, fq], capture_output=True)
            r2 = subprocess.run([binpath, "composite", "-r", dbdir,
                                 "-q", out], capture_output=True)
            dt = time.time() - t0
            if r1.returncode == 0 and r2.returncode == 0:
                ref_best = min(ref_best, dt)
        if np.isfinite(ref_best):
            res["e2e_ref_total_s"] = round(ref_best, 4)
    return res


def _worker_main(argv) -> None:
    """bench.py --worker <task> <backend>; prints one JSON line."""
    task, backend = argv[0], argv[1]
    if backend == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    fq, shufp = _prepare()
    res = {}
    if task == "sketch":
        res["reads_per_s"] = _worker_sketch(fq, shufp, backend)
    elif task == "profile":
        res.update(_worker_profile(backend))
    elif task == "abv":
        res.update(_worker_abv(backend))
    elif task == "kernel":
        res.update(_worker_kernel())
    elif task == "e2e":
        res.update(_worker_e2e(backend))
    print("WORKER_RESULT " + json.dumps(res), flush=True)


_LAST_WORKER_TIMED_OUT = False


def _run_worker(task: str, backend: str, timeout: int):
    """Run a measurement in a subprocess; None on failure/timeout
    (_LAST_WORKER_TIMED_OUT distinguishes the two — a timeout kill may
    have wedged the remote chip, so callers must NOT retry it)."""
    global _LAST_WORKER_TIMED_OUT
    _LAST_WORKER_TIMED_OUT = False
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", task,
             backend], capture_output=True, timeout=timeout, text=True)
    except subprocess.TimeoutExpired:
        print(f"bench: worker {task}/{backend} timed out", file=sys.stderr)
        _LAST_WORKER_TIMED_OUT = True
        return None
    for line in r.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    print(f"bench: worker {task}/{backend} failed rc={r.returncode}\n"
          + (r.stderr or "")[-2000:], file=sys.stderr)
    return None


# --------------------------------------------------------------------------
# profile latency + abv search (synthetic MarkerDB; oracle-matched)
# --------------------------------------------------------------------------

N_SPECIES = int(os.environ.get("MKSSD_BENCH_SPECIES", 4096))
IDS_PER_SPECIES = 3000


def _profile_fixture():
    """MarkerDB-scale fixture: a real koc query sketch of the bench fastq
    plus a synthetic reference sketch dir (N_SPECIES species x ~3K ids,
    ~12M postings — profiling consumes only the artifacts, so the db
    sketches are drawn directly rather than sketched from genomes).
    Both toolchains read the same files."""
    dbdir = os.path.join(CACHE, f"prof_db_{N_SPECIES}")
    qdir = os.path.join(CACHE, "prof_qry")
    fq, shufp = _prepare()
    if not os.path.exists(os.path.join(qdir, "cofiles.stat")):
        from metakssd_tpu import cli
        cli.main(["dist", "-L", shufp, "-A", "-o", qdir, fq])
    if not os.path.exists(os.path.join(dbdir, "cofiles.stat")):
        from metakssd_tpu.formats.codir import CoDir, write_codir
        from metakssd_tpu.formats.costat import CoStat
        from metakssd_tpu.formats.shuf import read_shuf
        rng = np.random.default_rng(21)
        q = CoDir.read(qdir, want_abund=False)
        qids = np.asarray(q.ids[0])
        p = read_shuf(shufp).params
        per_genome = []
        for i in range(N_SPECIES):
            own = rng.integers(0, 1 << 32, size=IDS_PER_SPECIES,
                               dtype=np.uint32)
            mix = rng.choice(qids, size=min(qids.size // 2, 500),
                             replace=False)
            ids = np.unique(np.concatenate([own, mix]))
            per_genome.append([(ids, None)])
        ctx = np.array([g[0][0].size for g in per_genome], dtype=np.uint32)
        stat = CoStat(p.shuf_id, False, 2 * p.k, 2 * p.drlevel, 1,
                      int(ctx.sum()), ctx,
                      [f"sp{i}" for i in range(N_SPECIES)])
        write_codir(dbdir, stat, per_genome)
    return dbdir, qdir, shufp


def _worker_profile(backend: str) -> dict:
    os.environ["MKSSD_BACKEND"] = backend
    dbdir, qdir, shufp = _profile_fixture()
    from metakssd_tpu import composite
    outp = os.path.join(CACHE, "prof_out.tsv")
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        with open(outp, "w") as f:
            composite.get_species_abundance(dbdir, qdir, out=f)
        best = min(best, time.time() - t0)
    res = {"profile_latency_s": best}
    # oracle baseline on the identical artifacts
    binpath = _oracle_bin()
    if binpath:
        ref_best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            r = subprocess.run([binpath, "composite", "-r", dbdir, "-q",
                                qdir], capture_output=True)
            if r.returncode == 0:
                ref_best = min(ref_best, time.time() - t0)
        if np.isfinite(ref_best):
            res["profile_ref_latency_s"] = ref_best
    return res


def _worker_abv(backend: str) -> dict:
    os.environ["MKSSD_BACKEND"] = backend
    from metakssd_tpu import composite
    dbdir, _, _ = _profile_fixture()
    # synthetic abv corpus over the fixture MarkerDB's species
    rng = np.random.default_rng(5)
    abvdir = os.path.join(dbdir, "abundance_Vec")
    os.makedirs(abvdir, exist_ok=True)
    nsp, nsamp = 64, 4096
    if not os.listdir(abvdir):
        for s in range(nsamp):
            nd = int(rng.integers(8, 48))
            idx = np.sort(rng.choice(nsp, nd, replace=False)).astype(np.int32)
            pct = (rng.random(nd).astype(np.float32) * 10).astype(np.float32)
            from metakssd_tpu.formats.abv import write_abv_file
            write_abv_file(os.path.join(abvdir, f"s{s}.abv"), idx, pct)
    composite.index_abv(dbdir)
    qnames = sorted(os.listdir(abvdir))[:64]
    qpaths = [os.path.join(abvdir, q) for q in qnames]
    res = {}
    with open(os.devnull, "w") as devnull:
        t0 = time.time()
        composite.abv_search(dbdir, qpaths, mode=2, out=devnull)
        res["abv_queries_per_s"] = len(qpaths) / (time.time() - t0)
        # batched dense path: all queries in one matmul dispatch (warm:
        # the dense DB matrix is staged once per index, like a serving
        # process would).  Only meaningful on an MXU — skip on the cpu
        # backend, where it just burns bench time and records a number
        # that reads as a regression (it is the wrong path there; see
        # PERF.md "dense vs sparse" note).
        if backend == "tpu":
            composite.abv_search_dense(dbdir, qpaths[:2], mode=2,
                                       out=devnull)
            t0 = time.time()
            composite.abv_search_dense(dbdir, qpaths, mode=2,
                                       out=devnull)
            res["abv_dense_queries_per_s"] = \
                len(qpaths) / (time.time() - t0)
    # oracle baseline on the identical (byte-compatible) index + corpus
    binpath = _oracle_bin()
    if binpath:
        t0 = time.time()
        # cwd=abvdir: the reference opens query .abv files relative to
        # its working directory; also require real output so a silent
        # open failure can't record a bogus fast baseline.
        r = subprocess.run([binpath, "composite", "-r", dbdir, "-s", "2"]
                           + qnames, capture_output=True, cwd=abvdir)
        dt = time.time() - t0
        if r.returncode == 0 and len(r.stdout.splitlines()) >= len(qnames):
            res["abv_ref_queries_per_s"] = len(qnames) / dt
    if "abv_dense_queries_per_s" in res:
        res["abv_queries_per_s"] = max(res["abv_queries_per_s"],
                                       res["abv_dense_queries_per_s"])
    return res


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

def _device_healthy(timeout_s: int = 240) -> "float | None":
    """Probe device execution in a subprocess (a wedged TPU tunnel hangs
    forever).  Generous timeout for the FIRST dispatch (a cold tunnel
    has been observed to take >200 s), but a *warm* trivial dispatch
    must come back fast: a degraded tunnel (observed: ~58 s per warm
    dispatch) passes a liveness check and then burns the whole worker
    budget, so treat warm latency > 15 s as unhealthy and let the
    native CPU engines carry the bench."""
    # warm with the EXACT computation shape so the timed rep is a pure
    # dispatch+readback (a fresh shape would recompile through the
    # tunnel, ~tens of seconds, and misclassify a healthy device);
    # fresh input data per rep so the dispatch is not served from cache
    code = ("import time, jax, jax.numpy as jnp, numpy as np;"
            "f = jax.jit(lambda x: x.sum());"
            "np.asarray(f(jnp.arange(8)));"              # cold compile
            "t0 = time.time();"
            "s = int(np.asarray(f(jnp.arange(8) + 1)));"  # warm dispatch
            "print(s, time.time() - t0)")
    # Returns the warm-dispatch latency in seconds (recorded in the
    # bench JSON as the tunnel-health annotation), or None if unhealthy.
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        if r.returncode != 0:
            return None
        parts = r.stdout.split()
        if (len(parts) >= 2 and parts[0] == b"36"
                and float(parts[1]) < 15.0):  # sum(1..8) == 36
            return float(parts[1])
        return None
    except (subprocess.TimeoutExpired, ValueError):
        return None


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        _worker_main(sys.argv[2:])
        return

    if len(sys.argv) > 1 and sys.argv[1] == "--e2e":
        # e2e-only: one JSON line for the integrated profiling flow
        _prepare()
        probe_s = _device_healthy()
        if probe_s is None:
            # cold attach can exceed the first probe budget; the failed
            # probe warms the remote side (same retry as the main run)
            probe_s = _device_healthy(120)
        e2e = _run_worker("e2e", "auto" if probe_s is not None else "cpu",
                          WORKER_TIMEOUT)
        ref = e2e.get("e2e_ref_total_s", 0.0) if e2e else 0.0
        print(json.dumps({
            "metric": "e2e_profile_latency_s",
            "value": e2e["e2e_total_s"] if e2e else 0.0,
            "unit": "s",
            "vs_baseline": round(ref / e2e["e2e_total_s"], 3)
            if e2e and ref else 0.0,
            "extra": {"stages": e2e["e2e_stages"] if e2e else {},
                      "e2e_cold_total_s":
                          e2e.get("e2e_cold_total_s") if e2e else None,
                      "e2e_ref_total_s": ref,
                      "device_probe_warm_s": probe_s},
        }))
        return

    fq, shufp = _prepare()
    ref_rps = _bench_reference(fq, shufp)

    probe_s = _device_healthy()
    if probe_s is None:
        # a cold tunnel attach alone has exceeded the probe budget;
        # the failed probe warms the remote side, so retry once
        probe_s = _device_healthy(120)
    healthy = probe_s is not None
    if not healthy:
        print("bench: device unhealthy; all measurements on cpu",
              file=sys.stderr)

    # self-annotation: the tunnel's documented ~2x load swings make
    # absolute numbers noise across rounds — record the probe latency
    # and which backend actually carried each measurement so the JSON
    # explains itself (a warm dispatch+readback is ~0.03 s on a healthy
    # tunnel; minutes-long degradation episodes have been observed)
    extra = {"device_probe_warm_s": round(probe_s, 4) if healthy
             else None,
             "device_healthy": healthy}
    # framework default path (auto backend: native host engine behind a
    # tunnel-attached TPU, device path on a colocated TPU)
    backend = "auto" if healthy else "cpu"
    res = _run_worker("sketch", backend, WORKER_TIMEOUT)
    if res is None and healthy:
        backend = "cpu"
        res = _run_worker("sketch", "cpu", WORKER_TIMEOUT)
    value = res["reads_per_s"] if res else 0.0
    extra["sketch_backend"] = backend

    if healthy:
        tpu = _run_worker("sketch", "tpu", WORKER_TIMEOUT)
        if tpu:
            extra["tpu_reads_per_s"] = round(tpu["reads_per_s"], 1)
            if ref_rps:
                # same-run ratio: both sides measured minutes apart on
                # this host/tunnel, so this survives the load swings
                # that make cross-round absolute numbers incomparable
                extra["tpu_vs_ref_same_run"] = round(
                    tpu["reads_per_s"] / ref_rps, 2)
            if tpu["reads_per_s"] > value:
                value = tpu["reads_per_s"]
                extra["sketch_backend"] = "tpu"
        kern = _run_worker("kernel", "tpu", WORKER_TIMEOUT)
        if kern is None and not _LAST_WORKER_TIMED_OUT:
            # transient tunnel aborts (observed: "TPU backend error
            # (Aborted)" mid-transfer) — one retry before giving up.
            # NOT after a timeout: the kill may have wedged the chip,
            # and a retry would hang another full WORKER_TIMEOUT.
            kern = _run_worker("kernel", "tpu", WORKER_TIMEOUT)
        if kern:
            extra["kernel_mwin_per_s"] = round(
                kern["kernel_mwin_per_s"], 1)

    prof = _run_worker("profile", "auto" if healthy else "cpu",
                       WORKER_TIMEOUT)
    if prof:
        extra.update({k: round(v, 4) for k, v in prof.items()})
    abv = _run_worker("abv", "cpu", WORKER_TIMEOUT)
    if abv:
        extra.update({k: round(v, 1) for k, v in abv.items()})
    e2e = _run_worker("e2e", "auto" if healthy else "cpu",
                      WORKER_TIMEOUT)
    if e2e:
        extra["e2e_total_s"] = e2e["e2e_total_s"]
        extra["e2e_cold_total_s"] = e2e.get("e2e_cold_total_s")
        extra["e2e_stages"] = e2e["e2e_stages"]
        if "e2e_ref_total_s" in e2e:
            # the oracle is cold every invocation by design (it rebuilds
            # its hash per run) — report BOTH our first-contact cold
            # ratio and the sidecar-warm steady state
            extra["e2e_ref_total_s"] = e2e["e2e_ref_total_s"]
            extra["e2e_vs_ref"] = round(
                e2e["e2e_ref_total_s"] / e2e["e2e_total_s"], 2)
            if e2e.get("e2e_cold_total_s"):
                extra["e2e_cold_vs_ref"] = round(
                    e2e["e2e_ref_total_s"] / e2e["e2e_cold_total_s"], 2)
    if ref_rps:
        extra["ref_reads_per_s"] = round(ref_rps, 1)

    print(json.dumps({
        "metric": "fastq_sketch_reads_per_s",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / ref_rps, 3) if ref_rps else 0.0,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
