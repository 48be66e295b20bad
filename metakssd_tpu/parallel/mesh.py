"""Multi-chip execution: device meshes, sharded sketching and profiling.

The reference parallelises with OpenMP threads + mmap'd files on one node
(SURVEY §2.4); here the equivalents are jax.sharding meshes:

  * read batches are data-parallel over the ``data`` axis (each device
    sketches its shard of the code stream);
  * the MarkerDB postings are sharded over the ``db`` axis (each device
    scans its slice of the reference k-mer space);
  * partial sketches merge with all_gather, coverage/shared-count
    vectors merge with psum — deterministic integer reductions, so the
    result is bit-identical to the single-device path.

Multi-host (DCN): ``init_distributed()`` joins the JAX distributed
runtime; ``make_mesh`` then spans every host's devices with the ``data``
axis over hosts (its collectives move only small merged results, fine
for DCN) and the ``db`` axis within one host (posting scans ride ICI).
Every process runs the same pipeline over the same (shared-filesystem)
inputs; host arrays are staged with ``host_to_global`` and results come
back fully replicated, so each process writes identical artifacts.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metakssd_tpu.ops import sketch_xla

UINT32_MAX = np.uint32(0xFFFFFFFF)

_DISTRIBUTED = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Join the JAX distributed runtime for multi-host execution.

    Args default to the MKSSD_COORDINATOR / MKSSD_NPROCS / MKSSD_PROCID
    environment (so ``MKSSD_COORDINATOR=host0:1234 MKSSD_NPROCS=2
    MKSSD_PROCID=$i metakssd_tpu dist ...`` on each host is all a
    launcher needs).  Must run before any JAX backend use.  No-op
    (returns False) when no coordinator is configured.  The reference
    has no multi-node story at all (OpenMP only, Makefile:2); this is
    the TPU-pod deployment shape of SURVEY §2.4.
    """
    global _DISTRIBUTED
    if _DISTRIBUTED:
        return True
    coordinator = coordinator or os.environ.get("MKSSD_COORDINATOR")
    if not coordinator:
        return False
    try:
        if num_processes is None:
            num_processes = int(os.environ["MKSSD_NPROCS"])
        if process_id is None:
            process_id = int(os.environ["MKSSD_PROCID"])
    except (KeyError, ValueError) as e:
        raise RuntimeError(
            "multi-host join failed: MKSSD_COORDINATOR is set but "
            "MKSSD_NPROCS / MKSSD_PROCID are missing or non-integer "
            f"({e!r}) — the launcher must export all three") from e
    # bounded join: a dead coordinator must surface as a clean error,
    # not an indefinite hang — and it cannot be caught around
    # jax.distributed.initialize (the coordination client LOG(FATAL)s
    # the whole process on deadline), so non-coordinator processes
    # probe the coordinator socket themselves first, tolerating the
    # normal worker-starts-first race by polling until the deadline
    # (MKSSD_COORD_TIMEOUT seconds, default 300).
    timeout = int(os.environ.get("MKSSD_COORD_TIMEOUT", "300"))
    host, _, port = coordinator.rpartition(":")
    if not host or not port.isdigit():
        raise RuntimeError(
            f"multi-host join failed: MKSSD_COORDINATOR must be "
            f"host:port, got {coordinator!r}")
    import time as _time
    t0 = _time.time()
    if process_id != 0:
        import socket
        deadline = t0 + timeout
        while _time.time() < deadline:
            try:
                socket.create_connection((host, int(port)),
                                         timeout=2).close()
                break
            except OSError:
                _time.sleep(0.5)
        else:
            raise RuntimeError(
                f"multi-host join failed: coordinator {coordinator} "
                f"unreachable within {timeout}s (process {process_id}/"
                f"{num_processes}) — check that process 0 is up and the "
                f"address is correct")
    # the probe's elapsed time counts against the SAME budget (or a
    # slow-to-listen coordinator would double the documented bound) —
    # but keep at least half the budget for the join barrier: a
    # coordinator that appears just before the probe deadline must not
    # leave initialize a sliver that LOG(FATAL)s mid-join
    remaining = max(int(timeout - (_time.time() - t0)),
                    timeout // 2, 10)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               initialization_timeout=remaining)
    _DISTRIBUTED = True
    return True


def _multihost() -> bool:
    return _DISTRIBUTED and jax.process_count() > 1


def make_mesh(n_data: int | None = None, n_db: int = 1,
              devices=None) -> Mesh:
    """(data, db) mesh.  Multi-host: devices order by (process, id) so a
    reshape puts the db axis inside one host (n_db must divide the
    per-host device count) and the data axis across hosts, and the mesh
    always spans every host (all processes must participate in every
    collective)."""
    if devices is None:
        devices = jax.devices()
        if _multihost():
            devices = sorted(devices,
                             key=lambda d: (d.process_index, d.id))
            n_data = len(devices) // n_db
    if n_data is None:
        n_data = len(devices) // n_db
    dev = np.asarray(devices[:n_data * n_db]).reshape(n_data, n_db)
    return Mesh(dev, axis_names=("data", "db"))


def host_to_global(arr, mesh: Mesh, spec: P):
    """Stage a host array (same full copy on every process) as a global
    device array with the given PartitionSpec.  Single-process: plain
    device_put.  Multi-process: each process contributes the shards its
    local devices own, cut from its full host copy."""
    s = NamedSharding(mesh, spec)
    arr = np.asarray(arr)
    if not _multihost():
        return jax.device_put(arr, s)
    return jax.make_array_from_callback(arr.shape, s,
                                        lambda idx: arr[idx])


def _sketch_shard(codes, accept_tups, pfilters, *, k, subk, drlevel,
                  nwin, max_out):
    """One device's shard: windows -> padded sorted survivor drtuples.

    Survivors compact to the front via sort (non-survivors map to
    UINT32_MAX); output is the first ``max_out`` sorted entries plus the
    true count.  UINT32_MAX padding merges harmlessly downstream because
    counts bound the valid prefix.
    """
    key, keep = sketch_xla._sketch_chunk.__wrapped__(
        codes, accept_tups, pfilters, k=k, subk=subk, drlevel=drlevel,
        nwin=nwin)
    masked = jnp.where(keep, key, UINT32_MAX)
    srt = jnp.sort(masked)
    return srt[:max_out], jnp.sum(keep.astype(jnp.int32))


def _sketch_shard_packed(packed, vmask, accept_mask, accept_tups,
                         pfilters, *, k, subk, drlevel, nwin, max_out):
    """Fast per-device shard: 2-bit packed input + accept-bitmask filter
    (the compact kernel's body, shard_map-compatible)."""
    dr, cnt = sketch_xla._sketch_chunk_compact.__wrapped__(
        packed, vmask, accept_mask, accept_tups, pfilters,
        k=k, subk=subk, drlevel=drlevel, nwin=nwin, max_out=max_out)
    # pad tail beyond max_out is undefined order; mask by count downstream
    return dr, cnt


def make_sharded_profile_step(mesh: Mesh, *, k: int, subk: int,
                              drlevel: int, nwin: int, max_out: int,
                              num_refs: int):
    """Build the jitted multi-chip profiling step.

    Inputs (global shapes):
      codes        uint8[n_data, nwin + 2k - 1]  sharded over 'data'
      accept_tups  uint32[A]                      replicated
      pfilters     uint32[A]                      replicated
      ref_ids      uint32[R]    sorted postings, sharded over 'db'
      ref_gid      int32[R]     genome of each posting, sharded over 'db'

    Returns uint32[num_refs] shared-k-mer counts (replicated) — the
    coverage accumulator of composite profiling / the one-query column of
    the dist matrix.
    """
    TL = 2 * k

    def step(codes, accept_tups, pfilters, ref_ids, ref_gid):
        # --- per-device sketch of this read shard ---
        my_keys, my_count = _sketch_shard(
            codes[0], accept_tups, pfilters, k=k, subk=subk,
            drlevel=drlevel, nwin=nwin, max_out=max_out)
        # --- merge partial sketches across the data axis ---
        all_keys = jax.lax.all_gather(my_keys, "data", tiled=True)
        merged = jnp.sort(all_keys)
        # global unique: first occurrence of each value in sorted order
        prev = jnp.concatenate([jnp.full((1,), UINT32_MAX, jnp.uint32),
                                merged[:-1]])
        is_first = (merged != prev) & (merged != UINT32_MAX)
        uniq = jnp.where(is_first, merged, UINT32_MAX)
        uniq = jnp.sort(uniq)          # unique values front, pad back
        # --- scan this device's slice of the reference postings ---
        pos = jnp.searchsorted(uniq, ref_ids, side="left")
        pos = jnp.minimum(pos, uniq.shape[0] - 1)
        hit = (uniq[pos] == ref_ids) & (ref_ids != UINT32_MAX)
        partial = jax.ops.segment_sum(hit.astype(jnp.uint32), ref_gid,
                                      num_segments=num_refs)
        # --- merge across the db axis (and replicate over data) ---
        return jax.lax.psum(partial, ("db",))

    spec_in = (P("data", None), P(), P(), P("db"), P("db"))
    spec_out = P()
    from jax import shard_map
    sharded = shard_map(step, mesh=mesh, in_specs=spec_in,
                        out_specs=spec_out, check_vma=False)
    return jax.jit(sharded)


_EXP_STEP_CACHE: dict = {}


def _expansion_step(mesh: Mesh, num_refs: int):
    """Cached jitted shard_map step for _expansion_shared_counts (a
    per-call closure would recompile on every invocation)."""
    multihost = _multihost()
    key = (mesh, num_refs, multihost)
    fn = _EXP_STEP_CACHE.get(key)
    if fn is not None:
        return fn
    from jax import shard_map
    from metakssd_tpu.ops.profile_device import _expand_tile

    def step(sst, sen, gids, subs, w, nm):
        g, valid = _expand_tile(sst, sen, gids, subs[0], nm[0, 0],
                                nref=num_refs, npost=gids.shape[0])
        wf = jnp.where(valid, w[0][:, None], jnp.uint32(0))
        gs, ws = jax.lax.sort((g.reshape(-1), wf.reshape(-1)),
                              num_keys=1)
        bounds = jnp.searchsorted(
            gs, jnp.arange(num_refs + 1, dtype=jnp.int32))
        cs = jnp.concatenate([jnp.zeros(1, jnp.uint32),
                              jnp.cumsum(ws, dtype=jnp.uint32)])
        row = (jnp.take(cs, bounds[1:])
               - jnp.take(cs, bounds[:-1]))[None]
        if multihost:
            return jax.lax.all_gather(row, "data", axis=0, tiled=True)
        return row

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(None), P(None), P(None), P("data", None),
                  P("data", None), P("data", None)),
        out_specs=P(None, None) if multihost else P("data", None),
        check_vma=False))
    _EXP_STEP_CACHE[key] = fn
    return fn


def _expansion_shared_counts(ref, qry, mesh: Mesh) -> np.ndarray:
    """Matched-row-expansion shared-count matrix (db axis unused): query
    membership runs on the host against each component's distinct
    k-mers (sub-ms), and each device expands only the *matched* rows'
    postings into a static subrow tile, sorts by genome and differences
    a u32 prefix sum at the genome bounds.  Queries batch over the
    ``data`` mesh axis.  A per-posting device searchsorted (the previous
    step) measured 7 Mpostings/s on v5e — every search step is a
    dynamic gather — while this shape only touches matched postings."""
    from metakssd_tpu.formats.codir import CoDir
    from metakssd_tpu.formats import mco as mco_fmt
    from metakssd_tpu.ops.profile_device import SubrowTable

    if isinstance(ref, str):
        ref = CoDir.read(ref, want_abund=False)
    if isinstance(qry, str):
        qry = CoDir.read(qry, want_abund=False)
    num_refs = ref.stat.infile_num
    n_data = mesh.shape.get("data", 1)
    nqry = qry.stat.infile_num
    out = np.zeros((nqry, num_refs), dtype=np.uint32)
    stepf = _expansion_step(mesh, num_refs)

    for c in range(ref.stat.comp_num):
        inv = mco_fmt.InvertedIndex.from_codir(ref, c)
        if inv.kmers.size == 0:
            continue
        sub = SubrowTable(inv.offsets.astype(np.int64), inv.gids,
                          sharding=NamedSharding(mesh, P()),
                          put=(lambda a: host_to_global(a, mesh, P()))
                          if _multihost() else None)
        rk = np.asarray(inv.kmers)
        prepped = []
        for q in range(nqry):
            qids = np.sort(qry.genome_ids(c, q))
            uq, mult = np.unique(qids, return_counts=True)
            pos = np.searchsorted(rk, uq)
            pos_c = np.minimum(pos, rk.size - 1)
            member = rk[pos_c] == uq
            subs, wsub = sub.expand_rows(
                pos_c[member], mult[member].astype(np.uint32))
            prepped.append((subs, wsub))
        for q0 in range(0, nqry, n_data):
            batch = prepped[q0:q0 + n_data]
            nmax = max((s.size for s, _ in batch), default=0)
            if nmax == 0:
                continue
            bucket = 1 << max(nmax - 1, 1).bit_length()
            spad = np.zeros((n_data, bucket), np.int32)
            wpad = np.zeros((n_data, bucket), np.uint32)
            nm = np.zeros((n_data, 1), np.int32)
            for r, (s, w) in enumerate(batch):
                spad[r, :s.size] = s
                wpad[r, :w.size] = w
                nm[r, 0] = s.size
            cnt = stepf(sub._sst_d, sub._sen_d, sub._gids_d,
                        host_to_global(spad, mesh, P("data", None)),
                        host_to_global(wpad, mesh, P("data", None)),
                        host_to_global(nm, mesh, P("data", None)))
            out[q0:q0 + len(batch)] += np.asarray(
                cnt[:len(batch)], dtype=np.uint32)
    return out


def sharded_shared_counts(ref, qry, mesh: Mesh,
                          use_data_axis: bool = True) -> np.ndarray:
    """Multi-chip shared-k-mer matrix over real sketch artifacts.

    The reference-side postings are staged device-resident ONCE in
    *genome-major* order, sharded over the ``db`` mesh axis; queries are
    batched over the ``data`` axis (one query per data row).  Per-device
    reduction is scatter-free: a u32 prefix sum over the posting
    multiplicities and a boundary-difference at the genome bounds
    (modular arithmetic keeps the segment differences exact for any
    per-genome count < 2^32, the serial path's own width).  Partial
    counts merge with an integer psum over ``db``, so the result is
    bit-identical to the serial path (reference hot triple loop,
    command_dist.c:1022-1057).  This is the multi-chip deployment shape
    for MarkerDBs larger than one device's HBM.

    With a single db shard the matched-row-expansion step is used
    instead (see _expansion_shared_counts): it touches only matched
    postings and is ~30x faster on real TPU, where this function's
    per-posting searchsorted is gather-latency-bound.  Both are
    bit-identical to the serial path.
    """
    from metakssd_tpu.formats.codir import CoDir
    from metakssd_tpu.formats import mco as mco_fmt

    if mesh.shape["db"] == 1 and use_data_axis:
        return _expansion_shared_counts(ref, qry, mesh)

    if isinstance(ref, str):
        ref = CoDir.read(ref, want_abund=False)
    if isinstance(qry, str):
        qry = CoDir.read(qry, want_abund=False)
    num_refs = ref.stat.infile_num
    n_db = mesh.shape["db"]
    n_data = mesh.shape.get("data", 1) if use_data_axis else 1
    nqry = qry.stat.infile_num
    out = np.zeros((nqry, num_refs), dtype=np.uint32)

    def step(post_k, bounds, qids, qlen):
        # Weight each posting by the query k-mer's multiplicity (per-read
        # fastq sketches carry duplicates; the serial path walks posting
        # rows once per query occurrence, command_dist.c:1044-1049).
        # qids is padded to a size bucket with UINT32_MAX; clamping both
        # searchsorted results to the real length keeps a posting k-mer
        # equal to UINT32_MAX from counting the padding.  Padded query
        # rows carry qlen 0 and contribute all-zero counts.
        n = qlen[0, 0]
        pk = post_k[0]
        lo = jnp.minimum(jnp.searchsorted(qids[0], pk, side="left"), n)
        hi = jnp.minimum(jnp.searchsorted(qids[0], pk, side="right"), n)
        mult = (hi - lo).astype(jnp.uint32)
        s = jnp.concatenate([jnp.zeros(1, jnp.uint32),
                             jnp.cumsum(mult, dtype=jnp.uint32)])
        # local slice of the global genome-major bounds; pad postings
        # sit past the last bound and are never counted
        off = jax.lax.axis_index("db") * pk.shape[0]
        b = jnp.clip(bounds[0] - off, 0, pk.shape[0])
        sb = s[b]
        partial = sb[1:] - sb[:-1]
        row = jax.lax.psum(partial, ("db",))[None]
        if multihost:
            # replicate over the data axis so every process can read the
            # whole matrix (tiny: n_data x num_refs u32 over DCN)
            return jax.lax.all_gather(row, "data", axis=0, tiled=True)
        return row

    multihost = _multihost()
    from jax import shard_map
    stepf = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(None, "db"), P(None, None), P("data", None),
                  P("data", None)),
        out_specs=P(None, None) if multihost else P("data", None),
        check_vma=False))

    for c in range(ref.stat.comp_num):
        inv = mco_fmt.InvertedIndex.from_codir(ref, c)
        if inv.kmers.size == 0:
            continue
        lens = np.diff(inv.offsets.astype(np.int64))
        post_k = np.repeat(inv.kmers, lens)
        post_g = inv.gids.astype(np.int64)
        order = np.argsort(post_g, kind="stable")
        post_k = post_k[order]
        bounds = np.zeros(num_refs + 1, dtype=np.int64)
        np.cumsum(np.bincount(post_g, minlength=num_refs), out=bounds[1:])
        npost = post_k.size
        pad = -(-npost // n_db) * n_db - npost
        post_k = np.concatenate([post_k,
                                 np.zeros(pad, np.uint32)])[None]
        # stage the postings device-resident ONCE per component — every
        # query then ships only its (small) sketch
        post_k_d = host_to_global(post_k, mesh, P(None, "db"))
        bounds_d = host_to_global(bounds.astype(np.int32)[None], mesh,
                                  P(None, None))
        qids_all = [np.sort(qry.genome_ids(c, q)) for q in range(nqry)]
        for q0 in range(0, nqry, n_data):
            batch = qids_all[q0:q0 + n_data]
            nq = max((b.size for b in batch), default=0)
            if nq == 0:
                continue
            # pad to a power-of-two bucket: one compiled step per
            # (postings, bucket) shape instead of one per query
            bucket = 1 << max(nq - 1, 1).bit_length()
            qpad = np.full((n_data, bucket), UINT32_MAX, dtype=np.uint32)
            qlen = np.zeros((n_data, 1), dtype=np.int32)
            for r, ids in enumerate(batch):
                qpad[r, :ids.size] = ids
                qlen[r, 0] = ids.size
            cnt = stepf(post_k_d, bounds_d,
                        host_to_global(qpad, mesh, P("data", None)),
                        host_to_global(qlen, mesh, P("data", None)))
            out[q0:q0 + len(batch)] += np.asarray(
                cnt[:len(batch)], dtype=np.uint32)
    return out


class ShardedMatchIndex:
    """MarkerDB match index with the distinct k-mer space sharded over
    the ``db`` mesh axis — the multi-chip deployment shape for MarkerDBs
    larger than one device's HBM.

    Drop-in for composite._CompIndex: ``match()`` returns the identical
    (matched posting genomes, matched query abundances), so profiling
    output is byte-identical to the serial path.  Each device holds one
    contiguous slice of the sorted distinct k-mers and probes every
    query against it; a query k-mer is found on exactly one device.
    """

    def __init__(self, rk: np.ndarray, starts: np.ndarray,
                 gid_sorted: np.ndarray, mesh: Mesh):
        from jax.sharding import NamedSharding
        self.starts = np.asarray(starts)
        self.gid_sorted = np.asarray(gid_sorted)
        self.mesh = mesh
        n_db = mesh.shape["db"]
        nk = rk.size
        per_dev = -(-max(nk, 1) // n_db)
        pad = per_dev * n_db - nk
        rk_pad = np.concatenate(
            [np.asarray(rk, np.uint32),
             np.full(pad, UINT32_MAX, np.uint32)])
        self.nk = nk
        self.per_dev = per_dev
        self.rk_d = host_to_global(rk_pad, mesh, P("db"))
        from jax import shard_map
        multihost = _multihost()

        def fn(rk_sh, qids, qlen):
            # local positions only (int32-safe even for >2^31 global
            # k-mers); the host adds the device offset in int64
            pos = jnp.searchsorted(rk_sh, qids, side="left")
            pos_c = jnp.minimum(pos, rk_sh.shape[0] - 1)
            member = ((rk_sh[pos_c] == qids)
                      & (jnp.arange(qids.shape[0]) < qlen[0]))
            member, pos_c = member[None], pos_c[None].astype(jnp.int32)
            if multihost:
                member = jax.lax.all_gather(member, "db", axis=0,
                                            tiled=True)
                pos_c = jax.lax.all_gather(pos_c, "db", axis=0,
                                           tiled=True)
            return member, pos_c

        out = ((P(None, None), P(None, None)) if multihost
               else (P("db", None), P("db", None)))
        self._step = jax.jit(shard_map(
            fn, mesh=mesh, in_specs=(P("db"), P(None), P(None)),
            out_specs=out, check_vma=False))

    def match(self, qids_s: np.ndarray, qab_s: np.ndarray, use_pallas
              ) -> tuple[np.ndarray, np.ndarray]:
        nq = qids_s.size
        if nq == 0 or self.nk == 0:
            return (np.zeros(0, np.int32), np.zeros(0, np.uint16))
        bucket = 1 << max(nq - 1, 1).bit_length()
        qpad = np.full(bucket, UINT32_MAX, dtype=np.uint32)
        qpad[:nq] = qids_s
        member2d, lpos2d = self._step(
            self.rk_d, host_to_global(qpad, self.mesh, P(None)),
            host_to_global(np.array([nq], np.int32), self.mesh,
                           P(None)))
        member2d = np.asarray(member2d)
        lpos2d = np.asarray(lpos2d)
        m_any = member2d.any(axis=0)[:nq]
        dev = np.argmax(member2d, axis=0)[:nq]
        cols = np.nonzero(m_any)[0]
        rows = (dev[m_any].astype(np.int64) * self.per_dev
                + lpos2d[dev[m_any], cols])
        # drop matches landing in the UINT32_MAX pad slice (only a real
        # query id equal to the pad value can produce one)
        valid = rows < self.nk
        rows = rows[valid]
        ab = qab_s[cols[valid]]
        st, en = self.starts[rows], self.starts[rows + 1]
        lens = en - st
        total = int(lens.sum())
        if total == 0:
            return (np.zeros(0, np.int32), np.zeros(0, np.uint16))
        bnd = np.zeros(rows.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=bnd[1:])
        flat = (np.arange(total, dtype=np.int64)
                - np.repeat(bnd, lens) + np.repeat(st, lens))
        return (self.gid_sorted[flat].astype(np.int32),
                np.repeat(ab, lens))


_UNION_STEP_CACHE: dict = {}


def _union_step(mesh: Mesh, shard: int, with_counts: bool):
    """Cached per-(mesh, shard size) jitted union kernel."""
    key = (mesh, shard, with_counts)
    fn = _UNION_STEP_CACHE.get(key)
    if fn is not None:
        return fn
    from jax import shard_map
    multihost = _multihost()

    def step(x):
        # sorted-merge union of this device's shard: sort, mask
        # duplicates to the pad value, re-sort to compact unique values
        # to the front.  (The reference's analogue is a 512 MiB host
        # bitmap, command_set.c:266-311 — scatter-hostile on TPU; a
        # bitonic sort keeps the MXU-adjacent vector units busy.)
        s = jnp.sort(x[0])
        prev = jnp.concatenate(
            [jnp.full((1,), UINT32_MAX, jnp.uint32), s[:-1]])
        first = (s != prev) & (s != UINT32_MAX)
        if with_counts:
            # occurrence count capped at 2 — enough to decide global
            # uniqueness after the host merge (counts are summed there)
            nxt = jnp.concatenate(
                [s[1:], jnp.full((1,), UINT32_MAX, jnp.uint32)])
            dup = (s == nxt)                    # >=2 occurrences
            cnt = jnp.where(first, 1 + dup.astype(jnp.uint8), 0)
            u, c = jax.lax.sort(
                (jnp.where(first, s, UINT32_MAX), cnt), num_keys=1)
            n = jnp.sum(first.astype(jnp.int32))
            out = (u[None], c[None], n[None])
        else:
            u = jnp.sort(jnp.where(first, s, UINT32_MAX))
            n = jnp.sum(first.astype(jnp.int32))
            out = (u[None], n[None])
        if multihost:
            out = tuple(jax.lax.all_gather(o, "data", axis=0, tiled=True)
                        for o in out)
        return out

    nout = 3 if with_counts else 2
    if multihost:
        out_specs = tuple([P(None, None)] * (nout - 1)) + (P(None),)
    else:
        out_specs = tuple([P("data", None)] * (nout - 1)) + (P("data"),)
    fn = jax.jit(shard_map(step, mesh=mesh, in_specs=(P("data", None),),
                           out_specs=out_specs, check_vma=False))
    _UNION_STEP_CACHE[key] = fn
    return fn


def device_union(ids: np.ndarray, mesh: Mesh,
                 return_counts: bool = False):
    """Distinct sorted values of a u32 multiset via per-device
    sorted-merge kernels over the ``data`` axis (each device sorts +
    dedups its shard; the host merges the much smaller unique runs).
    With return_counts, also returns per-value occurrence counts capped
    at 2 (enough to decide global uniqueness).  Output identical to
    np.unique."""
    n_dev = mesh.shape["data"]
    ids = np.ascontiguousarray(ids, dtype=np.uint32)
    n = ids.size
    if n == 0:
        return ((np.zeros(0, np.uint32), np.zeros(0, np.int64))
                if return_counts else np.zeros(0, np.uint32))
    shard = -(-n // n_dev)
    pad = shard * n_dev - n
    x = np.concatenate([ids, np.full(pad, UINT32_MAX, np.uint32)])
    x = x.reshape(n_dev, shard)
    stepf = _union_step(mesh, shard, return_counts)
    outs = stepf(host_to_global(x, mesh, P("data", None)))
    if return_counts:
        u2, c2, nvalid = (np.asarray(o) for o in outs)
    else:
        u2, nvalid = (np.asarray(o) for o in outs)
    nvalid = nvalid.reshape(-1)
    vals = np.concatenate([u2[d, :nvalid[d]] for d in range(n_dev)])
    if not return_counts:
        # UINT32_MAX real values were masked out on device; restore
        out = np.unique(vals)
        if (ids == 0xFFFFFFFF).any():
            out = np.union1d(out, np.uint32(0xFFFFFFFF))
        return out.astype(np.uint32)
    cnts = np.concatenate([c2[d, :nvalid[d]] for d in range(n_dev)])
    uniq, inv = np.unique(vals, return_inverse=True)
    tot = np.bincount(inv, weights=cnts.astype(np.float64),
                      minlength=uniq.size)
    nmax = (ids == 0xFFFFFFFF).sum()
    if nmax:
        uniq = np.concatenate([uniq, [np.uint32(0xFFFFFFFF)]])
        tot = np.concatenate([tot, [min(nmax, 2)]])
    return uniq.astype(np.uint32), tot.astype(np.int64)


def sharded_sketch(codes: np.ndarray, shuf, mesh: Mesh,
                   max_out_per_device: int = 1 << 16) -> np.ndarray:
    """Sketch one code stream data-parallel over the mesh; returns the
    sorted drtuple multiset (duplicates preserved), identical to the
    single-device sketch_codes output."""
    p = shuf.params
    TL = p.kmer_len
    n_data = mesh.shape["data"]
    nwin_total = max(codes.size - TL + 1, 0)
    nwin = -(-nwin_total // n_data)
    nwin = max(nwin, 1)
    # build overlapping shards [n_data, nwin + TL - 1], 2-bit packed
    shard_len = nwin + TL - 1
    packed_rows, vmask_rows = [], []
    for d in range(n_data):
        start = d * nwin
        seg = np.full(shard_len, 255, dtype=np.uint8)
        chunk = codes[start:start + shard_len]
        seg[:chunk.size] = chunk
        pk, vm = sketch_xla.pack_codes(seg)
        packed_rows.append(pk)
        vmask_rows.append(vm)
    packed = np.stack(packed_rows)
    vmask = np.stack(vmask_rows)
    at, pf, am = shuf.device_tables()

    multihost = _multihost()

    @jax.jit
    def run(packed_sh, vmask_sh, am_, at_, pf_):
        from jax import shard_map

        def fn(pk, vm, m, a, f):
            keys, cnt = _sketch_shard_packed(
                pk[0], vm[0], m, a, f, k=p.k, subk=p.subk,
                drlevel=p.drlevel, nwin=nwin,
                max_out=max_out_per_device)
            keys, cnt = keys[None], cnt[None]
            if multihost:
                # replicate so every process holds all partial sketches
                keys = jax.lax.all_gather(keys, "data", axis=0,
                                          tiled=True)
                cnt = jax.lax.all_gather(cnt, "data", tiled=True)
            return keys, cnt

        return shard_map(
            fn, mesh=mesh,
            in_specs=(P("data", None), P("data", None), P(), P(), P()),
            out_specs=((P(None, None), P(None)) if multihost
                       else (P("data", None), P("data"))),
            check_vma=False)(packed_sh, vmask_sh, am_, at_, pf_)

    keys, counts = run(host_to_global(packed, mesh, P("data", None)),
                       host_to_global(vmask, mesh, P("data", None)),
                       host_to_global(np.asarray(am), mesh, P()),
                       host_to_global(np.asarray(at), mesh, P()),
                       host_to_global(np.asarray(pf), mesh, P()))
    keys = np.asarray(keys)
    counts = np.asarray(counts)
    parts = []
    for d in range(n_data):
        if counts[d] <= max_out_per_device:
            parts.append(keys[d, :counts[d]].astype(np.uint64))
        else:   # overflow: exact single-device recompute of this shard
            start = d * nwin
            seg = codes[start:start + shard_len]
            parts.append(sketch_xla.sketch_codes(seg, shuf,
                                                 accept=(at, pf, am)))
    out = np.concatenate(parts)
    out.sort()
    return out.astype(np.uint64)
