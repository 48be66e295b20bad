"""One-command metagenome profiling: fastq -> profile -> abundance.

The reference's headline workflow is three separate invocations
(reference README.md:42-51):

    metakssd dist -L L3K11.shuf -A -o sketch sample.fastq
    metakssd composite -r markerdb -q sketch > species_coverage.tsv
    perl possion.kssd2out.pl species_coverage.tsv S > abundance.tsv

``profile_fastq`` runs the same flow as ONE timed pipeline so the
whole-workflow latency is a single measured number rather than a budget
assembled from component rates: stage-I abundance sketching (device
backends ride the DEPTH=2 h2d-overlapped Pallas path in
ops/sketch_pallas.py:704; tunnel/CPU routes use the native host
engine), MarkerDB composite profiling (staged index reused across
calls), Poisson normalization, and optionally CAMI conversion.
"""

from __future__ import annotations

import os
import time

from metakssd_tpu.utils import TIMER


def profile_fastq(fastqs: list[str], markerdb: str, shuf, outdir: str,
                  shkm_thr: int = 6, opts=None,
                  cami: tuple[str, str] | None = None,
                  min_km_s: int | None = None, shard_db: int = 0) -> dict:
    """fastq(.gz) sample(s) -> species relative-abundance profile.

    ``shuf``: a DimShuffle or a path to the ``.shuf`` used to build the
    MarkerDB.  Writes under ``outdir``:

    - ``qry.co/``              abundance sketch (reference ``dist -A``)
    - ``species_coverage.tsv`` raw composite profile
    - ``abundance.tsv``        Poisson-normalized relative abundances
    - ``cami.profile``         (only with ``cami=(psid2ncbi, nodes)``)

    Returns ``{"stages": {name: seconds}, "total_s": float,
    "artifacts": {...}}`` — the measured per-stage budget the PERF.md
    roofline predicts (reference e2e: one command per stage, untimed).
    """
    import dataclasses

    from metakssd_tpu import composite, pipeline
    from metakssd_tpu.formats.shuf import read_shuf
    from metakssd_tpu.postprocess import poisson

    if isinstance(shuf, str):
        shuf = read_shuf(shuf)
    opts = opts or pipeline.SketchOptions()
    if not opts.abundance:
        opts = dataclasses.replace(opts, abundance=True)
    os.makedirs(outdir, exist_ok=True)
    qry_co = os.path.join(outdir, "qry.co")
    tsv_path = os.path.join(outdir, "species_coverage.tsv")
    abund_path = os.path.join(outdir, "abundance.tsv")
    artifacts = {"sketch": qry_co, "coverage_tsv": tsv_path,
                 "abundance_tsv": abund_path}

    mark = len(TIMER.stages)
    t0 = time.time()
    with TIMER.stage("e2e.sketch"):
        pipeline.run_stage1(fastqs, shuf, qry_co, opts)
    with TIMER.stage("e2e.profile"):
        kw = {} if min_km_s is None else {"min_km_s": min_km_s}
        with open(tsv_path, "w") as f:
            composite.get_species_abundance(markerdb, qry_co,
                                            outdir=outdir, out=f,
                                            shard_db=shard_db, **kw)
    with TIMER.stage("e2e.poisson"):
        with open(tsv_path) as f, open(abund_path, "w") as g:
            poisson.poisson_abundance(f, shkm_thr=shkm_thr, out=g)
    if cami is not None:
        from metakssd_tpu.postprocess import cami as cami_pp
        cami_path = os.path.join(outdir, "cami.profile")
        with TIMER.stage("e2e.cami"):
            psid_map = cami_pp.load_psid_map(cami[0])
            node2rank, node2pa, node2name = cami_pp.load_nodes(cami[1])
            with open(tsv_path) as f, open(cami_path, "w") as g:
                cami_pp.composite_to_cami_profile(
                    f, psid_map, node2rank, node2pa, node2name,
                    shkm_thr=float(shkm_thr), out=g)
        artifacts["cami_profile"] = cami_path
    total = time.time() - t0

    stages: dict[str, float] = {}
    for name, dt in TIMER.stages[mark:]:   # includes nested sub-stages
        stages[name] = round(stages.get(name, 0.0) + dt, 4)
    return {"stages": stages, "total_s": round(total, 4),
            "artifacts": artifacts}
