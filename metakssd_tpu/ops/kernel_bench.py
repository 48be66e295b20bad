"""Chained-dispatch kernel-only benchmark for the Pallas sketch kernel.

Single home for the timing methodology (round-3 lesson: per-dispatch
host readbacks through the axon tunnel measure ~25-30 ms of latency,
not the kernel): K dispatches are queued back-to-back and ONE readback
drains them; inputs are fresh per dispatch (identical dispatches can be
served from caches); best-of-`reps` passes is reported.

Used by bench.py (kernel_mwin_per_s extra) so the scoreboard number and
the PERF.md probes share one harness.  The kernel configuration
(use_bfs/pack/use_sig, RWIN/CSLOT env) is auto-detected exactly as the
product path (`sketch_codes_pallas`) would choose it.
"""

from __future__ import annotations

import time

import numpy as np


def kernel_chain_mwin(shuf=None, nwin: int = 1 << 24, k_reps: int = 16,
                      reps: int = 3) -> float:
    """Mwin/s of the compact sketch kernel on the default device."""
    import jax
    import jax.numpy as jnp

    from metakssd_tpu.ops import sketch_pallas, sketch_xla

    if shuf is None:
        from metakssd_tpu.formats.shuf import make_shuf
        from metakssd_tpu.params import SketchParams
        shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=1234)
    p = shuf.params
    a_tups, a_pf, _ = shuf.device_tables()
    a_tups, a_pf = np.asarray(a_tups), np.asarray(a_pf)
    n_accept = a_tups.size
    RWIN, LANES = sketch_pallas.RWIN, sketch_pallas.LANES
    TL = p.kmer_len
    ext = sketch_pallas._ext(TL)
    nblocks = nwin // (RWIN * LANES)

    # the product path's own mode decision (single source of truth)
    use_bfs, pack, use_sig = sketch_pallas.kernel_modes(p, n_accept)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=nwin + TL - 1).astype(np.uint8)
    packed, vmask = sketch_xla.pack_codes(
        np.concatenate([codes, np.full(RWIN + ext, 255, np.uint8)]))
    tiles = sketch_pallas._restructure_packed(
        jax.device_put(packed), jax.device_put(vmask),
        nblocks=nblocks, TL=TL, n=nwin + RWIN + ext)
    tiles = jax.block_until_ready(tiles)
    a2d = jax.device_put(a_tups.reshape(-1, LANES))
    p2d = jax.device_put(a_pf.reshape(-1, LANES))
    lev2d = jax.device_put(
        sketch_pallas._bfs_levels(a_tups) if use_bfs
        else np.zeros((1, LANES), np.uint32))
    sig2d = jax.device_put(sketch_pallas._sig_tables(a_tups)) \
        if use_sig else None
    kw = dict(k=p.k, subk=p.subk, drlevel=p.drlevel, nblocks=nblocks,
              n_accept=n_accept, use_bfs=use_bfs, pack=pack,
              use_sig=use_sig)
    fn = jax.jit(lambda t: jnp.sum(
        sketch_pallas.sketch_tiles_compact_pallas(
            t, a2d, p2d, lev2d, sig2d, **kw)[0].astype(jnp.int32)))
    vary = [jax.block_until_ready(tiles ^ np.int32(i))
            for i in range(k_reps)]
    np.asarray(fn(vary[0]))                          # warm compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        outs = [fn(v) for v in vary]
        np.asarray(jnp.stack(outs).sum())            # ONE readback
        best = min(best, time.time() - t0)
    return nwin * k_reps / best / 1e6
