"""Stage-I pipeline: sequence files -> combined sketch directory.

TPU-native counterpart of reference run_stageI (command_dist.c:341-502):
per-file sketching feeds the device kernel; per-component combined
arrays + prefix index + stat file are written exactly in the reference's
on-disk format.  Unlike the reference (which randomises input order via
srand(time)), file order is deterministic (sorted) unless a seed is given.
"""

from __future__ import annotations

import dataclasses
import os
import numpy as np

from metakssd_tpu.formats.shuf import DimShuffle, read_shuf, make_shuf, write_shuf
from metakssd_tpu.formats.costat import CoStat
from metakssd_tpu.formats.codir import write_codir
from metakssd_tpu.io import seqio
from metakssd_tpu.ops.golden import sets_from_drtuples
from metakssd_tpu.params import SketchParams
from metakssd_tpu.utils import backend_policy

ACCEPT_EXTS = seqio.FASTA_EXTS + seqio.FASTQ_EXTS


@dataclasses.dataclass
class SketchOptions:
    """Mirrors the reference dist options (command_dist_wrapper.c:68-96)."""
    abundance: bool = False    # -A  (koc mode, u16 counts)
    dedup: bool = False        # -u  (keep multiplicity-1 k-mers only)
    min_occ: int = 1           # -n  (fastq least k-mer occurrence)
    min_qual: int = 0          # -Q  (fastq base-quality filter)
    byread: bool = False       # --byread (per-read sketching)
    pipecmd: str = ""          # -P  (decompress/filter command -> fastq)
    threads: int = 0           # -p  (host parse pool; 0 = cpu count)
    keepcofile: bool = False   # --keepcofile (per-file .co intermediates)
    mesh: int = 0              # --mesh (data-parallel sketch over N devices)
    ckpt: bool = False         # --ckpt (per-file/per-batch stage-I resume)


def organize_infiles(args: list[str], list_file: str | None = None) -> list[str]:
    """Expand dirs / list files / file args into an ordered list of inputs
    (reference organize_infile_frm_arg / organize_infile_list,
    global_basic.c:169-325)."""
    paths: list[str] = []
    if list_file:
        with open(list_file) as f:
            for line in f:
                line = line.strip()
                if line:
                    paths.append(line)
    for a in args or []:
        if os.path.isdir(a):
            for name in sorted(os.listdir(a)):
                base = name[:-3] if name.endswith(".gz") else name
                if os.path.splitext(base)[1].lower() in ACCEPT_EXTS:
                    paths.append(os.path.join(a, name))
        else:
            paths.append(a)
    return paths


# Whole-file fastq ingestion switches to the bounded-memory streaming
# parser above this on-disk size (MKSSD_STREAM=1 forces it, =0 forbids).
# Default 0: streaming always wins when the native parser is available —
# it reuses one batch buffer, whereas the whole-file path's fresh
# full-size codes allocation costs ~1 s/GB in first-touch page faults on
# this host (round-2 PERF note).
STREAM_THRESHOLD = int(os.environ.get("MKSSD_STREAM_THRESHOLD", 0))
STREAM_BATCH_BASES = int(os.environ.get("MKSSD_STREAM_BATCH", 64 << 20))


# Streaming checkpoint cadence (batches between persisted snapshots).
CKPT_EVERY = int(os.environ.get("MKSSD_CKPT_EVERY", 8))


def _ckpt_key(path: str, shuf: DimShuffle, mode: str, min_qual: int):
    st = os.stat(path)
    return {"file": os.path.abspath(path), "size": st.st_size,
            "mtime": st.st_mtime, "shuf_id": shuf.params.shuf_id,
            "mode": mode, "min_qual": min_qual,
            "batch_bases": STREAM_BATCH_BASES}


def _ckpt_save(ckpt_file: str, payload: dict) -> None:
    """Atomic checkpoint write (tmp + rename): a crash mid-save leaves
    the previous snapshot intact."""
    tmp = ckpt_file + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, ckpt_file)


def _ckpt_load(ckpt_file: str, key: dict):
    if not os.path.exists(ckpt_file):
        return None
    try:
        z = np.load(ckpt_file, allow_pickle=False)
        import json as _json
        if _json.loads(str(z["key"])) != key:
            return None
        return z
    except (OSError, ValueError, KeyError):
        return None


def _sketch_fastq_streaming(path: str, shuf: DimShuffle, mode: str,
                            min_occ: int, min_qual: int, accept,
                            ckpt_file: str | None = None,
                            threads: int = 0):
    """Sketch an arbitrarily large fastq with O(batch) host memory:
    fixed-size read batches stream from the native parser (reads never
    split, so no window spans a batch boundary), each batch's accepted
    drtuples accumulate (~1/4096 of windows), and unique/count runs once
    at the end.  The reference's analogue is the 64 KiB buffer /
    65536-read batch loop (iseq2comem.c:655-673).

    With ckpt_file set, the accumulated drtuples persist every
    CKPT_EVERY batches; a restart replays the (cheap, native) parse of
    already-sketched batches but skips their device sketch — the
    TPU-build analogue of SURVEY §5's per-batch accumulator
    checkpointing (the reference can only restart a sample from zero)."""
    from metakssd_tpu.io import native
    import json as _json
    if ckpt_file is None and backend_policy() == "cpu":
        # fused native parse+translate+sketch: one OpenMP pool, no
        # full-size codes array, bit-identical drtuples (native.py
        # sketch_fastq); the batch loop below remains the resumable
        # (--ckpt) and device-backend path.
        dr = native.sketch_fastq(path, shuf, accept=accept,
                                 min_qual=min_qual, nthreads=threads)
        if dr is not None:
            return sets_from_drtuples(dr, shuf.params,
                                                 mode=mode,
                                                 min_occ=min_occ)
    key = _ckpt_key(path, shuf, mode, min_qual)
    done = 0
    parts = []
    if ckpt_file:
        z = _ckpt_load(ckpt_file, key)
        if z is not None:
            done = int(z["done"])
            parts = [z["dr"].astype(np.uint64)]
    i = 0
    for codes, _ in native.stream_fastq(path, min_qual,
                                        STREAM_BATCH_BASES, copy=False):
        if i >= done:
            from metakssd_tpu.ops import sketch_xla
            parts.append(sketch_xla.sketch_codes(codes, shuf,
                                                 accept=accept))
            if ckpt_file and (i + 1 - done) % CKPT_EVERY == 0:
                _ckpt_save(ckpt_file, {
                    "key": np.str_(_json.dumps(key)),
                    "done": np.int64(i + 1),
                    "dr": np.concatenate(parts)})
        i += 1
    dr = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    if ckpt_file and os.path.exists(ckpt_file):
        os.remove(ckpt_file)
    return sets_from_drtuples(dr, shuf.params, mode=mode,
                                         min_occ=min_occ)


def sketch_file(path: str, shuf: DimShuffle, opts: SketchOptions,
                accept=None, ckpt_file: str | None = None
                ) -> list[tuple[np.ndarray, np.ndarray | None]]:
    """Sketch one input file into per-component (ids, counts)."""

    def _sets(codes, mode):
        if opts.mesh > 1:
            # data-parallel sketch over the device mesh (window shards
            # per device, exact merge; parallel/mesh.sharded_sketch)
            from metakssd_tpu.parallel import mesh as pmesh
            m = pmesh.make_mesh(n_data=opts.mesh, n_db=1)
            dr = pmesh.sharded_sketch(codes, shuf, m)
            return sets_from_drtuples(dr, shuf.params,
                                                 mode=mode,
                                                 min_occ=opts.min_occ)
        from metakssd_tpu.ops import sketch_xla
        return sketch_xla.sketch_to_sets(codes, shuf, mode=mode,
                                         min_occ=opts.min_occ,
                                         accept=accept)

    if opts.pipecmd:
        # reference treats piped input as fastq (command_dist.c:378)
        codes, _ = seqio.pipecmd_to_codes(
            opts.pipecmd, path,
            min_qual=0 if opts.abundance else opts.min_qual)
        return _sets(codes, "koc" if opts.abundance else "occ")
    fmt = seqio.sniff_format(path)
    if fmt == "fastq":
        mode = "koc" if opts.abundance else "occ"
        # reference -A path (mt_shortreads2koc) has no quality filter
        q = 0 if opts.abundance else opts.min_qual
        from metakssd_tpu.io import native
        stream = os.environ.get("MKSSD_STREAM", "1") != "0" and \
            os.path.getsize(path) >= STREAM_THRESHOLD
        if stream and opts.mesh <= 1 and native.available():
            return _sketch_fastq_streaming(path, shuf, mode,
                                           opts.min_occ, q, accept,
                                           ckpt_file=ckpt_file,
                                           threads=opts.threads)
        codes, _ = seqio.fastq_to_codes(path, min_qual=q)
        return _sets(codes, mode)
    codes = seqio.fasta_to_codes(path)
    return _sets(codes, "uniq" if opts.dedup else "set")


def sketch_byread(path: str, shuf: DimShuffle, out_dir: str,
                  accept=None) -> None:
    """Per-read sketching (reference reads2mco, iseq2comem.c:89-214):
    k-mers kept in stream order with duplicates; combco.index.c holds
    cumulative per-read counts."""
    p = shuf.params
    fmt = seqio.sniff_format(path)
    if fmt == "fastq":
        codes, starts = seqio.fastq_to_codes(path)
        read_starts = starts[:-1]          # one entry per read
    else:
        codes, read_starts = seqio.fasta_to_codes(path, return_headers=True)
    nreads = read_starts.size
    from metakssd_tpu.ops import sketch_xla
    pos, dr = sketch_xla.sketch_codes(codes, shuf, accept=accept,
                                      stream_order=True)
    # window at stream position w belongs to the read containing it
    # (pos is the window *start*; reads are separated by RESETs so a
    # window never spans two reads)
    read_of = np.searchsorted(read_starts, pos, side="right") - 1
    comp = (dr % np.uint64(p.component_num)).astype(np.int64)
    ids = (dr >> np.uint64(p.comp_code_bits)).astype(np.uint32)
    os.makedirs(out_dir, exist_ok=True)
    for c in range(p.component_num):
        sel = comp == c
        ids[sel].tofile(os.path.join(out_dir, f"combco.{c}"))
        counts = np.bincount(read_of[sel], minlength=nreads)
        index = np.zeros(nreads + 1, dtype=np.uint64)
        np.cumsum(counts, out=index[1:])
        index.tofile(os.path.join(out_dir, f"combco.index.{c}"))
    # the reference also writes a cofiles.stat for byread dirs (one
    # "genome" = the input file, ctx counts zeroed; command_dist.c:354)
    # — downstream readers (reverse -b, CoDir) expect it
    CoStat(shuf_id=p.shuf_id, koc=False, kmerlen=2 * p.k,
           dim_rd_len=2 * p.drlevel, comp_num=p.component_num,
           all_ctx_ct=0, ctx_ct=np.zeros(1, np.uint32),
           names=[path]).write(out_dir)


def _batched_stage1(inputs: list[str], shuf: DimShuffle,
                    opts: SketchOptions, accept, koc: bool):
    """Sketch many inputs in one device stream: files concatenate
    (RESET-separated), survivors are attributed to files by window
    position, then unique/count per file on the host.  One big device
    pass instead of one dispatch per file."""
    from metakssd_tpu.ops.sketch_xla import sketch_codes_with_positions
    p = shuf.params

    def _parse(path: str) -> np.ndarray:
        if seqio.sniff_format(path) == "fastq":
            q = 0 if opts.abundance else opts.min_qual
            return seqio.fastq_to_codes(path, min_qual=q)[0]
        return seqio.fasta_to_codes(path)

    def _mode_for(path: str) -> str:
        fq = seqio.sniff_format(path) == "fastq"
        if koc:
            return "koc"
        if opts.dedup and not fq:
            return "uniq"
        if fq and opts.min_occ > 1:
            return "occ"
        return "set"

    # host parse pool (-p): the native parser and sketcher release the
    # GIL inside the ctypes call, so threads give real parallelism (the
    # reference OpenMP-parallelises stage I over files,
    # command_dist.c:365)
    nthreads = opts.threads if opts.threads > 0 else (os.cpu_count() or 1)
    nthreads = min(nthreads, len(inputs))

    if backend_policy() == "cpu":
        # native backend: sketch each file inside the pool (1 OpenMP
        # thread per call, files in flight = pool width) instead of one
        # giant concatenated XLA-on-CPU dispatch
        from metakssd_tpu.io import native as native_io
        if native_io.available():
            def _one(path: str):
                dr = native_io.sketch_cpu(_parse(path), shuf,
                                          accept=accept, nthreads=1)
                return sets_from_drtuples(
                    dr, p, mode=_mode_for(path), min_occ=opts.min_occ)
            if nthreads > 1:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=nthreads) as pool:
                    return list(pool.map(_one, inputs))
            return [_one(path) for path in inputs]

    if nthreads > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=nthreads) as pool:
            parsed = list(pool.map(_parse, inputs))
    else:
        parsed = [_parse(path) for path in inputs]

    chunks: list[np.ndarray] = []
    bounds = np.zeros(len(inputs) + 1, dtype=np.int64)
    for i, c in enumerate(parsed):
        chunks.append(c)
        chunks.append(np.full(1, 255, dtype=np.uint8))
        bounds[i + 1] = bounds[i] + c.size + 1
    codes = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
    dr, pos = sketch_codes_with_positions(codes, shuf, accept=accept)
    gid = np.searchsorted(bounds, pos, side="right") - 1
    per_genome = []
    for g in range(len(inputs)):
        fmt_fastq = seqio.sniff_format(inputs[g]) == "fastq"
        mine = np.sort(dr[gid == g])
        uniq, counts = np.unique(mine, return_counts=True)
        ab = None
        if koc:
            ab = np.minimum(counts, 0xFFFF).astype(np.uint16)
        elif opts.dedup and not fmt_fastq:
            uniq = uniq[counts == 1]
        elif fmt_fastq and opts.min_occ > 1:
            uniq = uniq[counts >= opts.min_occ]
        comp = (uniq % np.uint64(p.component_num)).astype(np.int64)
        ids = (uniq >> np.uint64(p.comp_code_bits)).astype(np.uint32)
        per_genome.append([
            (ids[comp == ci],
             ab[comp == ci] if ab is not None else None)
            for ci in range(p.component_num)])
    return per_genome


# Files per batched-sketch group when checkpointing: a crash loses at
# most one group's work instead of the whole run.
CKPT_GROUP = int(os.environ.get("MKSSD_CKPT_GROUP", 64))


def _file_ckpt_path(ckpt_dir: str, i: int) -> str:
    return os.path.join(ckpt_dir, f"file{i}.npz")


def _file_ckpt_params(path: str, shuf: DimShuffle,
                      opts: "SketchOptions") -> str:
    # Everything that changes the sketch of `path` must key the ckpt
    # (mirrors _ckpt_key for the streaming variant): re-running into
    # the same out_dir with different parameters must re-sketch.
    return "|".join(str(x) for x in (
        os.path.abspath(path), shuf.params.shuf_id, opts.abundance,
        opts.dedup, opts.min_occ, opts.min_qual, opts.byread))


def _save_file_ckpt(fp: str, path: str, sets, params: str) -> None:
    st = os.stat(path)
    payload = {"size": np.int64(st.st_size), "mtime": np.float64(st.st_mtime),
               "params": np.array(params),
               "ncomp": np.int64(len(sets))}
    for c, (ids, ab) in enumerate(sets):
        payload[f"ids_{c}"] = np.asarray(ids, dtype=np.uint32)
        if ab is not None:
            payload[f"ab_{c}"] = np.asarray(ab)
    tmp = fp + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, fp)


def _load_file_ckpt(fp: str, path: str, params: str):
    if not os.path.exists(fp):
        return None
    try:
        z = np.load(fp, allow_pickle=False)
        st = os.stat(path)
        if int(z["size"]) != st.st_size or \
                float(z["mtime"]) != st.st_mtime or \
                "params" not in z.files or str(z["params"]) != params:
            return None
        return [(z[f"ids_{c}"],
                 z[f"ab_{c}"] if f"ab_{c}" in z.files else None)
                for c in range(int(z["ncomp"]))]
    except (OSError, ValueError, KeyError):
        return None


def run_stage1(inputs: list[str], shuf: DimShuffle, out_dir: str,
               opts: SketchOptions | None = None) -> CoStat:
    """Sketch all inputs and write the combined sketch directory.

    With opts.ckpt, per-file sketch results persist under
    out_dir/.stage1_ckpt/ as they complete (streaming single-file
    sketches additionally checkpoint every CKPT_EVERY batches); a
    re-run after a crash resumes instead of re-sketching.  SURVEY §5
    failure-recovery TPU-build note (the reference's only resume is
    whole-artifact granularity, command_dist.c:986-989)."""
    opts = opts or SketchOptions()
    p = shuf.params
    accept = shuf.device_tables()

    koc = opts.abundance
    if koc and any(seqio.sniff_format(f) != "fastq" for f in inputs):
        # reference closes abundance mode on non-fastq input
        # (command_dist.c:390-393)
        koc = False
        opts = dataclasses.replace(opts, abundance=False)

    from metakssd_tpu.utils import TIMER
    batchable = (len(inputs) > 1 and not opts.pipecmd and
                 opts.mesh <= 1 and
                 (not koc or
                  all(seqio.sniff_format(f) == "fastq" for f in inputs)))
    ckpt_dir = os.path.join(out_dir, ".stage1_ckpt") if opts.ckpt else None
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
    TIMER.count("stage1.files", len(inputs))
    with TIMER.stage("stage1.sketch"):
        if batchable:
            per_genome: list = [None] * len(inputs)
            todo = list(range(len(inputs)))
            if ckpt_dir:
                todo = []
                for i, path in enumerate(inputs):
                    got = _load_file_ckpt(_file_ckpt_path(ckpt_dir, i),
                                          path,
                                          _file_ckpt_params(path, shuf, opts))
                    if got is not None:
                        per_genome[i] = got
                    else:
                        todo.append(i)
            group = CKPT_GROUP if ckpt_dir else len(todo)
            for lo in range(0, len(todo), max(group, 1)):
                idx = todo[lo:lo + group]
                got = _batched_stage1([inputs[i] for i in idx], shuf,
                                      opts, accept, koc)
                for i, sets in zip(idx, got):
                    per_genome[i] = sets
                    if ckpt_dir:
                        _save_file_ckpt(_file_ckpt_path(ckpt_dir, i),
                                        inputs[i], sets,
                                        _file_ckpt_params(inputs[i], shuf,
                                                          opts))
        else:
            per_genome = []
            for i, path in enumerate(inputs):
                got = None
                if ckpt_dir:
                    got = _load_file_ckpt(_file_ckpt_path(ckpt_dir, i),
                                          path,
                                          _file_ckpt_params(path, shuf, opts))
                if got is None:
                    sck = (os.path.join(ckpt_dir, f"stream{i}.ckpt")
                           if ckpt_dir else None)
                    got = sketch_file(path, shuf, opts, accept=accept,
                                      ckpt_file=sck)
                    if ckpt_dir:
                        _save_file_ckpt(_file_ckpt_path(ckpt_dir, i),
                                        path, got,
                                        _file_ckpt_params(path, shuf, opts))
                per_genome.append(got)

    ctx_ct = np.array(
        [sum(g[c][0].size for c in range(p.component_num))
         for g in per_genome], dtype=np.uint32)
    stat = CoStat(shuf_id=p.shuf_id, koc=koc, kmerlen=2 * p.k,
                  dim_rd_len=2 * p.drlevel, comp_num=p.component_num,
                  all_ctx_ct=int(ctx_ct.sum()), ctx_ct=ctx_ct,
                  names=list(inputs))
    write_codir(out_dir, stat, per_genome)
    if opts.keepcofile:
        # per-file intermediates "{i}.co.{c}" (+ .a), the reference's
        # --keepcofile artifacts (command_dist.c:438-457)
        for i, g in enumerate(per_genome):
            for c in range(p.component_num):
                ids, ab = g[c]
                ids.astype(np.uint32).tofile(
                    os.path.join(out_dir, f"{i}.co.{c}"))
                if ab is not None:
                    ab.astype(np.uint16).tofile(
                        os.path.join(out_dir, f"{i}.co.{c}.a"))
    if ckpt_dir and os.path.isdir(ckpt_dir):
        # the combined artifact is now the durable checkpoint
        import shutil
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return stat


def resolve_shuffle(dr_file: str | None, k: int, drlevel: int,
                    out_dir: str, seed: int | None = None) -> DimShuffle:
    """-L handling: a .shuf path loads it; otherwise generate one into
    out_dir/default.shuf (reference get_dim_shuffle, command_dist.c:256-284)."""
    if dr_file and os.path.isfile(dr_file):
        return read_shuf(dr_file)
    shuf = make_shuf(SketchParams.for_drlevel(k, drlevel), seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    write_shuf(os.path.join(out_dir, "default.shuf"), shuf)
    return shuf
