"""Sorted-set membership at scale: the merge-path kernel.

Problem: composite profiling and dist search both reduce to "for every
reference k-mer (sorted), is it in the query sketch (sorted), and what
is its abundance?".  XLA's searchsorted lowers to ~27 scalar HBM gathers
per element (~100M/s) — seconds per sample at MarkerDB scale.

Design (two-phase, exploits both sides being sorted):
  phase 1 (XLA): anchor positions — one binary search per needle block
    (needles/BLOCK searches, negligible).
  phase 2 (Pallas): each grid program DMAs the haystack *window* its
    needle block can possibly hit (two W-aligned blocks selected by a
    scalar-prefetched index) into VMEM and binary-searches in-VMEM with
    lane dynamic-gathers — no HBM gathers at all.
Blocks whose window exceeds 2W (query locally denser than the window)
fall back to exact XLA searchsorted; they are rare by construction.

CPU / small inputs use a plain vectorised fallback.
"""

from __future__ import annotations

import numpy as np

LANES = 128
W = 2048          # haystack window block (two consecutive blocks = 4096)
BLOCK = 2048      # needles per grid program
UINT32_MAX = np.uint32(0xFFFFFFFF)


class StaticHaystack:
    """Device-resident sorted haystack (+values) reused across queries.

    Profiling and dist search probe the same MarkerDB for every sample;
    staging it once saves the dominant host->device transfer (the DB is
    tens of MB; a tunnel-attached TPU moves ~40 MB/s).
    """

    def __init__(self, haystack: np.ndarray,
                 values: np.ndarray | None = None):
        self.haystack = np.asarray(haystack, dtype=np.uint32)
        # values=None: IDENTITY (value of a hit = its haystack
        # position).  Kept implicit — both product callers want
        # positions, and materialising an arange costs ~0.5 s of
        # first-touch page faults per 50 MB on this host (it was the
        # single largest cold-staging item at bench scale); the host
        # fallback returns pos directly and the device table builds
        # lazily in _stage.
        self.identity = values is None
        self.values = None if self.identity \
            else np.asarray(values, dtype=np.uint32)
        nh = self.haystack.size
        self.nh_pad = (-(-max(nh, 1) // W) + 1) * W
        # Device staging is deferred: host-fallback callers (use_pallas
        # False, e.g. CPU paths on the tunnel-attached env) must never
        # pay the h2d transfer for buffers they will not touch.
        self._hay2d = None
        self._val2d = None

    def _stage(self):
        if self._hay2d is None:
            import jax
            nh = self.haystack.size
            hay_pad = np.full(self.nh_pad, UINT32_MAX, dtype=np.uint32)
            hay_pad[:nh] = self.haystack
            val_pad = np.zeros(self.nh_pad, dtype=np.uint32)
            val_pad[:nh] = np.arange(nh, dtype=np.uint32) \
                if self.identity else self.values
            self._hay2d = jax.device_put(hay_pad.reshape(-1, LANES))
            self._val2d = jax.device_put(val_pad.reshape(-1, LANES))
        return self._hay2d, self._val2d

    @property
    def hay2d(self):
        return self._stage()[0]

    @property
    def val2d(self):
        return self._stage()[1]


def sorted_membership(haystack, values, needles,
                      use_pallas: bool | None = None,
                      interpret: bool = False
                      ) -> tuple[np.ndarray, np.ndarray]:
    """member/value for each needle.

    haystack: sorted uint32 (no duplicates required for values to be
    meaningful) or a :class:`StaticHaystack`; values: uint32 aligned
    with haystack (or None; ignored for StaticHaystack); needles:
    sorted uint32.
    Returns (member bool[n], value uint32[n]).
    """
    staged = haystack if isinstance(haystack, StaticHaystack) else None
    identity = False
    if staged is not None:
        haystack, values = staged.haystack, staged.values
        identity = staged.identity
    haystack = np.asarray(haystack, dtype=np.uint32)
    needles = np.asarray(needles, dtype=np.uint32)
    if values is None and not identity:
        values = np.zeros_like(haystack)
    if values is not None:
        values = np.asarray(values, dtype=np.uint32)

    def fallback(nd):
        if haystack.size == 0 or nd.size == 0:
            return (np.zeros(nd.size, bool), np.zeros(nd.size, np.uint32))
        pos = np.searchsorted(haystack, nd)
        pos = np.minimum(pos, haystack.size - 1)
        m = haystack[pos] == nd
        if identity:   # value of a hit IS its position — no table
            return m, np.where(m, pos, 0).astype(np.uint32)
        return m, np.where(m, values[pos], 0).astype(np.uint32)

    if use_pallas is None:
        # auto: device membership only pays off when the device is
        # colocated (PCIe); through the axon tunnel the per-query d2h
        # dominates (PERF.md).  MKSSD_BACKEND=tpu forces the device
        # path.  backend_policy is jax-free on plain hosts.
        from metakssd_tpu.utils import backend_policy
        use_pallas = interpret or (backend_policy() == "tpu"
                                   and _on_tpu())
    if not use_pallas or needles.size < BLOCK or haystack.size == 0:
        return fallback(needles)
    import jax.numpy as jnp
    from metakssd_tpu.ops.merge_device import _member_pallas

    # pad haystack/values to a multiple of W (+ one extra block)
    nh = haystack.size
    if staged is not None:
        nh_pad, hay2d, val2d = staged.nh_pad, staged.hay2d, staged.val2d
    else:
        nh_pad = (-(-nh // W) + 1) * W
        hay_pad = np.full(nh_pad, UINT32_MAX, dtype=np.uint32)
        hay_pad[:nh] = haystack
        val_pad = np.zeros(nh_pad, dtype=np.uint32)
        val_pad[:nh] = values
        hay2d = jnp.asarray(hay_pad.reshape(-1, LANES))
        val2d = jnp.asarray(val_pad.reshape(-1, LANES))

    nn = needles.size
    nblocks = -(-nn // BLOCK)
    needles_pad = np.full(nblocks * BLOCK, UINT32_MAX, dtype=np.uint32)
    needles_pad[:nn] = needles

    # phase 1: anchor windows per needle block
    anchors = needles_pad.reshape(nblocks, BLOCK)[:, 0].copy()
    pos = np.searchsorted(haystack, anchors).astype(np.int64)
    ends = np.empty(nblocks, dtype=np.int64)
    block_last = needles_pad.reshape(nblocks, BLOCK)[:, -1].copy()
    ends = np.searchsorted(haystack, block_last, side="right")
    mblk = np.minimum(pos // W, nh_pad // W - 2).astype(np.int32)
    ok = ends <= (mblk.astype(np.int64) + 2) * W

    member, value = _member_pallas(
        jnp.asarray(mblk), hay2d, val2d,
        jnp.asarray(needles_pad.reshape(-1, LANES)),
        nblocks=nblocks, interpret=interpret)
    member = np.array(member).reshape(-1).astype(bool)[:nn]
    value = np.array(value).reshape(-1)[:nn]

    bad = np.nonzero(~ok)[0]
    if bad.size:
        for b in bad.tolist():
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, nn)
            if lo >= nn:
                continue
            m, v = fallback(needles[lo:hi])
            member[lo:hi] = m
            value[lo:hi] = v
    return member, value


def _on_tpu() -> bool:
    try:
        import jax
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
