"""Inverted-index ("mco") artifacts.

Reference format (co2mco.c:12-87), per component c:
    mco.c        — concatenated genome-id rows (uint32), one row per k-mer
                   id in [0, 16**component_sz), empty rows omitted
    mco.index.c  — uint64[16**component_sz] cumulative row end offsets
    mcofiles.stat — header (formats.costat.McoStat)

The dense index is the reference's design (34 GiB at component_sz=8!);
the TPU engine's native representation is the sparse CSR
:class:`InvertedIndex` (sorted distinct k-mer ids + row offsets +
gid postings) which converts losslessly to/from the dense format.
"""

from __future__ import annotations

import dataclasses
import os
import numpy as np

from metakssd_tpu.formats.codir import CoDir
from metakssd_tpu.formats.costat import McoStat

MCO_PREFIX = "mco"
MCO_IDX_PREFIX = "mco.index"


@dataclasses.dataclass
class InvertedIndex:
    """Sparse CSR inverted index for one component.

    kmers[i] is a distinct sorted k-mer id; its genome list is
    gids[offsets[i]:offsets[i+1]] (ascending genome order, matching the
    reference's sequential append order in co2mco.c:37-56).
    """
    kmers: np.ndarray     # uint32[nrows], sorted distinct
    offsets: np.ndarray   # uint64[nrows+1]
    gids: np.ndarray      # uint32[total_postings]

    @classmethod
    def from_codir(cls, cd: CoDir, c: int) -> "InvertedIndex":
        ids = cd.ids[c]
        index = cd.index[c]
        n = ids.size
        gid = np.empty(n, dtype=np.uint32)
        for g in range(cd.stat.infile_num):
            gid[int(index[g]):int(index[g + 1])] = g
        # stable sort by k-mer id keeps genome order inside each row
        order = np.argsort(ids, kind="stable")
        sk = ids[order]
        sg = gid[order]
        kmers, starts = np.unique(sk, return_index=True)
        offsets = np.empty(kmers.size + 1, dtype=np.uint64)
        offsets[:-1] = starts
        offsets[-1] = n
        return cls(kmers, offsets, sg)

    def row(self, kmer: int) -> np.ndarray:
        i = np.searchsorted(self.kmers, np.uint32(kmer))
        if i == self.kmers.size or self.kmers[i] != kmer:
            return np.zeros(0, dtype=np.uint32)
        return self.gids[int(self.offsets[i]):int(self.offsets[i + 1])]


def write_mco_component(dirpath: str, c: int, inv: InvertedIndex,
                        comp_space: int) -> None:
    """Write one component in the dense reference format.

    The dense cumulative index has 16^COMPONENT_SZ rows (34 GiB at the
    reference default of 8), so it is streamed in bounded chunks — the
    u64 row-size buffer is reused per chunk and carries a running
    offset, never materialising the whole index in RAM."""
    os.makedirs(dirpath, exist_ok=True)
    lens = np.diff(inv.offsets.astype(np.int64)).astype(np.uint64)
    kmers = inv.kmers.astype(np.int64)
    CH = 1 << 24
    with open(os.path.join(dirpath, f"{MCO_IDX_PREFIX}.{c}"), "wb") as f:
        base = np.uint64(0)
        buf = np.empty(min(CH, comp_space), dtype=np.uint64)
        lo_i = 0
        for off in range(0, comp_space, CH):
            n = min(CH, comp_space - off)
            chunk = buf[:n]
            chunk[:] = 0
            hi_i = int(np.searchsorted(kmers, off + n, side="left"))
            sel = slice(lo_i, hi_i)
            chunk[kmers[sel] - off] = lens[sel]
            lo_i = hi_i
            np.cumsum(chunk, out=chunk)
            chunk += base
            chunk.tofile(f)
            base = chunk[-1] if n else base
    inv.gids.astype(np.uint32).tofile(os.path.join(dirpath, f"{MCO_PREFIX}.{c}"))


def read_mco_component(dirpath: str, c: int) -> InvertedIndex:
    """Read a dense reference component back into sparse CSR form.

    The dense index is memory-mapped (34 GiB at the reference's default
    COMPONENT_SZ=8) and streamed once to find the non-empty rows."""
    from metakssd_tpu.formats.codir import _mmap_or_empty
    cum = _mmap_or_empty(os.path.join(dirpath, f"{MCO_IDX_PREFIX}.{c}"),
                         np.uint64)
    gids = _mmap_or_empty(os.path.join(dirpath, f"{MCO_PREFIX}.{c}"),
                          np.uint32)
    CH = 1 << 24      # chunked scan: bounded memory on the 34 GiB index
    prev = np.int64(0)
    kmer_chunks, size_chunks = [], []
    for off in range(0, cum.size, CH):
        seg = np.asarray(cum[off:off + CH], dtype=np.int64)
        sizes = np.diff(np.concatenate([[prev], seg]))
        nz = np.nonzero(sizes)[0]
        if nz.size:
            kmer_chunks.append((off + nz).astype(np.uint32))
            size_chunks.append(sizes[nz])
        prev = seg[-1]
    kmers = (np.concatenate(kmer_chunks) if kmer_chunks
             else np.zeros(0, np.uint32))
    offsets = np.zeros(kmers.size + 1, dtype=np.uint64)
    if size_chunks:
        offsets[1:] = np.cumsum(np.concatenate(size_chunks))
    return InvertedIndex(kmers, offsets, gids)


def build_mco(co_dir: str, mco_dir: str,
              component_sz: int | None = None) -> McoStat:
    """Stage II: invert a sketch dir into a reference-format mco dir
    (reference run_stageII, command_dist.c:504-552).

    component_sz controls the dense row space (16**component_sz) exactly
    like the reference's COMPONENT_SZ macro; the default (8) matches the
    reference's default build but produces a 32 GiB index file — pass 6
    to interoperate with `make alert`-style builds or for tests.
    """
    from metakssd_tpu import params as P
    comp_space = 1 << (4 * (component_sz if component_sz is not None
                            else P.COMPONENT_SZ))
    cd = CoDir.read(co_dir, want_abund=False)
    stat = McoStat.from_costat(cd.stat)
    os.makedirs(mco_dir, exist_ok=True)
    from metakssd_tpu.utils import TIMER
    for c in range(cd.stat.comp_num):
        with TIMER.stage("stage2.invert"):
            inv = InvertedIndex.from_codir(cd, c)
        with TIMER.stage("stage2.write"):
            write_mco_component(mco_dir, c, inv, comp_space)
    stat.write(mco_dir)
    return stat
