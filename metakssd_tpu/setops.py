"""Lossless sketch set algebra (reference command_set.c).

Every operation is a sorted-array merge over the canonical sorted-set
sketch representation — the TPU-friendly replacement for the reference's
512 MiB bitmaps and open-addressing hashes.  Outputs are byte-compatible:
pan/uniq_pan files are ascending-sorted by both toolchains (the
reference's bitmap iteration emits ascending ids, command_set.c:302-311),
and grouping replicates the reference's taxon ordering so genome indexes
line up across toolchains.
"""

from __future__ import annotations

import functools
import math
import os
import numpy as np

from metakssd_tpu.formats.costat import CoStat
from metakssd_tpu.formats.codir import (CoDir, SKCH_PREFIX, IDX_PREFIX,
                                        PAN_PREFIX, UNIQ_PAN_PREFIX)
from metakssd_tpu.params import LD_FCTR


def _timed(name: str):
    """Record the whole operation as one TIMER stage (MKSSD_LOG)."""
    def deco(fn):
        @functools.wraps(fn)
        def wrap(*a, **k):
            from metakssd_tpu.utils import TIMER
            with TIMER.stage(name):
                return fn(*a, **k)
        return wrap
    return deco


# --------------------------------------------------------------------------
# unions
# --------------------------------------------------------------------------

def _device_unique(ids: np.ndarray, return_counts: bool):
    """np.unique via the device sorted-merge kernels when a device
    backend is in play and the input is big enough to amortize staging
    (GTDB-scale pan builds).  Returns None for the host path.
    Force with MKSSD_DEVICE_SETOPS=1/0; size floor via
    MKSSD_DEVICE_SETOPS_MIN (default 4M ids — below that the host
    np.unique wins; see PERF.md crossover)."""
    force = os.environ.get("MKSSD_DEVICE_SETOPS")
    if force == "0":
        return None
    thr = int(os.environ.get("MKSSD_DEVICE_SETOPS_MIN", str(1 << 22)))
    if force != "1":
        if ids.size < thr:
            return None
        from metakssd_tpu.utils import backend_policy
        if backend_policy() != "tpu":
            return None
    from metakssd_tpu.parallel import mesh as pmesh
    m = pmesh.make_mesh(n_db=1)
    return pmesh.device_union(ids, m, return_counts=return_counts)


def _host_unique(ids: np.ndarray, return_counts: bool):
    """np.unique semantics via the native parallel radix sort + one
    linear pass — ~3x numpy at pan-build scale (np.unique is a serial
    introsort).  Falls back to np.unique without the native lib."""
    from metakssd_tpu.io import native as native_io
    if (ids.size >= (1 << 20) and native_io.available()
            and np.asarray(ids).dtype.itemsize <= 4):
        # itemsize guard: a wider-than-32-bit id stream would silently
        # merge ids sharing low 32 bits on this path while np.unique
        # would not — route it to numpy instead
        sk = np.empty(np.asarray(ids).size, np.uint32)
        np.copyto(sk, ids, casting="unsafe")
        native_io.radix_sort_u32(sk)
        from metakssd_tpu.utils import sorted_first_idx
        idx = sorted_first_idx(sk)
        vals = sk[idx]
        if not return_counts:
            return vals
        counts = np.empty(idx.size, np.int64)
        counts[:-1] = np.diff(idx)
        counts[-1] = sk.size - idx[-1]
        return vals, counts
    return np.unique(ids, return_counts=return_counts)


@_timed("set.union")
def sketch_union(insketch: str, outdir: str) -> None:
    """-u: union of all sketches -> pan.c (reference command_set.c:241-319)."""
    cd = CoDir.read(insketch, want_abund=False)
    os.makedirs(outdir, exist_ok=True)
    cd.stat.write(outdir)
    for c in range(cd.stat.comp_num):
        pan = _device_unique(cd.ids[c], False)
        if pan is None:
            pan = _host_unique(cd.ids[c], False)
        pan.astype(np.uint32).tofile(os.path.join(outdir, f"{PAN_PREFIX}.{c}"))


@_timed("set.uniq_union")
def uniq_sketch_union(insketch: str, outdir: str) -> None:
    """-q: k-mers present in exactly one genome -> uniq_pan.c
    (reference command_set.c:427-512)."""
    cd = CoDir.read(insketch, want_abund=False)
    os.makedirs(outdir, exist_ok=True)
    cd.stat.write(outdir)
    for c in range(cd.stat.comp_num):
        dev = _device_unique(cd.ids[c], True)
        if dev is not None:
            vals, counts = dev
        else:
            vals, counts = _host_unique(cd.ids[c], True)
        vals[counts == 1].astype(np.uint32).tofile(
            os.path.join(outdir, f"{UNIQ_PAN_PREFIX}.{c}"))


# --------------------------------------------------------------------------
# subtract / intersect against a pan sketch
# --------------------------------------------------------------------------

def _read_pan(pan_dir: str, c: int) -> np.ndarray:
    for prefix in (PAN_PREFIX, UNIQ_PAN_PREFIX):
        p = os.path.join(pan_dir, f"{prefix}.{c}")
        if os.path.exists(p):
            return np.fromfile(p, dtype=np.uint32)
    raise FileNotFoundError(f"no pan.{c} / uniq_pan.{c} in {pan_dir}")


def _in_sorted(sorted_set: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if sorted_set.size == 0:
        return np.zeros(vals.size, dtype=bool)
    pos = np.searchsorted(sorted_set, vals)
    pos = np.minimum(pos, sorted_set.size - 1)
    return sorted_set[pos] == vals


@_timed("set.operate")
def sketch_operate(insketch: str, pan_dir: str, outdir: str,
                   intersect: bool) -> None:
    """-s (subtract) / -i (intersect) every genome against a pan sketch,
    preserving per-genome entries (reference command_set.c:322-423)."""
    cd = CoDir.read(insketch, want_abund=False)
    pan_stat = CoStat.read(pan_dir)
    if pan_stat.shuf_id != cd.stat.shuf_id:
        raise ValueError(f"sketching id not match ({cd.stat.shuf_id} vs. "
                         f"{pan_stat.shuf_id})")
    os.makedirs(outdir, exist_ok=True)
    nfile = cd.stat.infile_num
    new_ctx = np.zeros(nfile, dtype=np.uint32)
    for c in range(cd.stat.comp_num):
        pan = np.sort(_read_pan(pan_dir, c))
        member = _in_sorted(pan, cd.ids[c])
        keep = member if intersect else ~member
        out_ids = cd.ids[c][keep]
        out_ids.astype(np.uint32).tofile(
            os.path.join(outdir, f"{SKCH_PREFIX}.{c}"))
        # per-genome counts of kept entries
        index = np.zeros(nfile + 1, dtype=np.uint64)
        kept_cum = np.concatenate([[0], np.cumsum(keep)])
        for g in range(nfile):
            lo, hi = int(cd.index[c][g]), int(cd.index[c][g + 1])
            cnt = int(kept_cum[hi] - kept_cum[lo])
            index[g + 1] = index[g] + cnt
            new_ctx[g] += cnt
        index.tofile(os.path.join(outdir, f"{IDX_PREFIX}.{c}"))
    # reference keeps the original header (incl. all_ctx_ct) but zeroes
    # then re-counts ctx_ct (command_set.c:345-346,402)
    stat = CoStat(cd.stat.shuf_id, cd.stat.koc, cd.stat.kmerlen,
                  cd.stat.dim_rd_len, cd.stat.comp_num, cd.stat.all_ctx_ct,
                  new_ctx, list(cd.stat.names))
    stat.write(outdir)


# --------------------------------------------------------------------------
# combine pan dirs into a multi-genome sketch
# --------------------------------------------------------------------------

@_timed("set.combine_pans")
def combine_pans(pan_dirs: list[str], outdir: str) -> None:
    """-c: each pan dir becomes one genome of a combined sketch
    (reference command_set.c:515-608)."""
    st0 = CoStat.read(pan_dirs[0])
    os.makedirs(outdir, exist_ok=True)
    ctx = np.zeros(len(pan_dirs), dtype=np.uint32)
    for c in range(st0.comp_num):
        chunks = []
        for i, d in enumerate(pan_dirs):
            sti = CoStat.read(d)
            if sti.shuf_id != st0.shuf_id:
                raise ValueError("combin_pans: shuf_id mismatch")
            arr = _read_pan(d, c)
            chunks.append(arr)
            ctx[i] += arr.size
        index = np.zeros(len(pan_dirs) + 1, dtype=np.uint64)
        np.cumsum([ch.size for ch in chunks], out=index[1:])
        np.concatenate(chunks).astype(np.uint32).tofile(
            os.path.join(outdir, f"{SKCH_PREFIX}.{c}"))
        index.tofile(os.path.join(outdir, f"{IDX_PREFIX}.{c}"))
    stat = CoStat(st0.shuf_id, st0.koc, st0.kmerlen, st0.dim_rd_len,
                  st0.comp_num, int(ctx.sum()), ctx, list(pan_dirs))
    stat.write(outdir)


def combine_queries(co_dirs: list[str], outdir: str) -> None:
    """Merge multiple sketch dirs, concatenating genomes
    (reference combine_queries, command_dist.c:1718-1919)."""
    stats = [CoStat.read(d) for d in co_dirs]
    st0 = stats[0]
    for st in stats[1:]:
        if st.shuf_id != st0.shuf_id or st.comp_num != st0.comp_num:
            raise ValueError("combine_queries: incompatible sketch dirs")
    cds = [CoDir.read(d) for d in co_dirs]
    koc = all(st.koc for st in stats)
    os.makedirs(outdir, exist_ok=True)
    names, ctx = [], []
    for st in stats:
        names.extend(st.names)
        ctx.extend(st.ctx_ct.tolist())
    for c in range(st0.comp_num):
        ids = np.concatenate([cd.ids[c] for cd in cds])
        counts = np.concatenate(
            [np.diff(cd.index[c].astype(np.int64)) for cd in cds])
        index = np.zeros(len(ctx) + 1, dtype=np.uint64)
        np.cumsum(counts, out=index[1:])
        ids.astype(np.uint32).tofile(os.path.join(outdir, f"{SKCH_PREFIX}.{c}"))
        index.tofile(os.path.join(outdir, f"{IDX_PREFIX}.{c}"))
        if koc:
            np.concatenate([cd.abund[c] for cd in cds]).astype(
                np.uint16).tofile(os.path.join(outdir, f"{SKCH_PREFIX}.{c}.a"))
    stat = CoStat(st0.shuf_id, koc, st0.kmerlen, st0.dim_rd_len,
                  st0.comp_num, int(np.sum(ctx)),
                  np.asarray(ctx, dtype=np.uint32), names)
    stat.write(outdir)


# --------------------------------------------------------------------------
# grouping by taxonomy
# --------------------------------------------------------------------------

def next_prime(n: int) -> int:
    """reference global_basic.c:453."""
    while True:
        for j in range(2, int(math.isqrt(n)) + 1):
            if n % j == 0:
                break
        else:
            return n
        n += 1


def organize_taxf(taxfile: str) -> list[tuple[int, str | None, list[int]]]:
    """Parse 'taxid<TAB>[name]' lines; group genome line-numbers by taxid.

    Returns taxa in the reference's hash-slot iteration order
    (command_set.c:635-705) so grouped-genome indexes match across
    toolchains.
    """
    with open(taxfile) as f:
        lines = f.read().splitlines()
    ln = len(lines)
    hashsz = next_prime(int(ln / LD_FCTR))
    slots: list[tuple[int, str | None, list[int]] | None] = [None] * hashsz

    def h(key: int, i: int) -> int:
        return (key % hashsz + i * (1 + key % (hashsz - 1))) % hashsz

    for i, line in enumerate(lines):
        parts = line.split("\t")
        taxid = int(parts[0])
        taxname = parts[1] if len(parts) > 1 and parts[1] else None
        for n in range(hashsz):
            hv = h(taxid, n)
            if slots[hv] is None:
                slots[hv] = (taxid, taxname, [i])
                break
            if slots[hv][0] == taxid:
                if slots[hv][1] != taxname:
                    raise ValueError(
                        f"taxid {taxid} has different taxnames")
                slots[hv][2].append(i)
                break
    return [s for s in slots if s is not None]


@_timed("set.grouping")
def grouping_genomes(insketch: str, taxfile: str, outdir: str) -> None:
    """-g: per-taxon union pan-sketches (reference grouping_genomes,
    command_set.c:831-974); taxid 0 is dropped."""
    taxa = organize_taxf(taxfile)
    cd = CoDir.read(insketch, want_abund=False)
    gn = sum(len(t[2]) for t in taxa)
    if cd.stat.infile_num != gn:
        raise ValueError(
            f"genome number {cd.stat.infile_num} does not match taxfile "
            f"genome number {gn}")
    os.makedirs(outdir, exist_ok=True)
    out_taxa = [t for t in taxa if t[0] != 0]
    ctx = np.zeros(len(out_taxa), dtype=np.uint32)
    for c in range(cd.stat.comp_num):
        chunks = []
        for ti, (taxid, name, gids) in enumerate(out_taxa):
            member = np.unique(np.concatenate(
                [cd.genome_ids(c, g) for g in gids]))
            chunks.append(member)
            ctx[ti] += member.size
        index = np.zeros(len(out_taxa) + 1, dtype=np.uint64)
        np.cumsum([ch.size for ch in chunks], out=index[1:])
        np.concatenate(chunks).astype(np.uint32).tofile(
            os.path.join(outdir, f"{SKCH_PREFIX}.{c}"))
        index.tofile(os.path.join(outdir, f"{IDX_PREFIX}.{c}"))
    names = [f"{t[0]}_{t[1]}" if t[1] else str(t[0]) for t in out_taxa]
    stat = CoStat(cd.stat.shuf_id, False, cd.stat.kmerlen,
                  cd.stat.dim_rd_len, cd.stat.comp_num, int(ctx.sum()),
                  ctx, names)
    stat.write(outdir)


def print_gnames(insketch: str) -> None:
    st = CoStat.read(insketch)
    for i in range(st.infile_num):
        print(f"{int(st.ctx_ct[i])}\t{st.names[i]}")
