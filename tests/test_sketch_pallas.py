"""Pallas fused kernel vs golden (interpret mode on CPU)."""

import numpy as np
import pytest

from metakssd_tpu.params import SketchParams
from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.ops import golden, sketch_pallas


@pytest.mark.parametrize("k,subk,drlevel", [(8, 5, 2), (11, 6, 3),
                                            (7, 5, 3), (6, 4, 2)])
def test_pallas_matches_golden(k, subk, drlevel):
    # dim_end is floored at MIN_SUBCTX_DIM_SMP_SZ=4096, so every config
    # has a 4096-entry accept table; (7,5,3)/(6,4,2) have
    # 4*(subk-drlevel) = 8 < log2(4096) so pack (and therefore the
    # signature probe) is OFF there — they cover the BFS no-pack path
    rng = np.random.default_rng(k)
    shuf = make_shuf(SketchParams(k=k, subk=subk, drlevel=drlevel), seed=k)
    codes = rng.integers(0, 4, size=300_000).astype(np.uint8)
    codes[rng.integers(0, codes.size, 200)] = 255
    res = sketch_pallas.sketch_codes_pallas(codes, shuf, interpret=True)
    assert res is not None
    keys, count = res
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    assert count == gold.size
    np.testing.assert_array_equal(keys, gold)


def test_pallas_small_input():
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=1)
    codes = np.array([0, 1, 2, 3] * 10, dtype=np.uint8)
    res = sketch_pallas.sketch_codes_pallas(codes, shuf, interpret=True)
    keys, count = res
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    assert count == gold.size
    np.testing.assert_array_equal(keys, gold)


def test_pallas_compact_kernel_matches_golden():
    rng = np.random.default_rng(3)
    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=3)
    codes = rng.integers(0, 4, size=200_000).astype(np.uint8)
    codes[rng.integers(0, codes.size, 100)] = 255
    keys, count = sketch_pallas.sketch_codes_pallas(
        codes, shuf, interpret=True, compact=True)
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    assert count == gold.size
    np.testing.assert_array_equal(keys, gold)


def test_pallas_compact_overflow_blocks():
    """Force the per-block survivor budget below the real count so the
    overflow rerun path engages."""
    rng = np.random.default_rng(4)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=4)
    codes = rng.integers(0, 4, size=200_000).astype(np.uint8)
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    assert gold.size > 4 * 128  # enough survivors to overflow 1 slot/lane
    old = sketch_pallas.CSLOT, sketch_pallas.MAXS
    sketch_pallas.CSLOT, sketch_pallas.MAXS = 1, 128
    sketch_pallas.sketch_tiles_compact_pallas.clear_cache()
    try:
        keys, count = sketch_pallas.sketch_codes_pallas(
            codes, shuf, interpret=True, compact=True)
    finally:
        sketch_pallas.CSLOT, sketch_pallas.MAXS = old
        sketch_pallas.sketch_tiles_compact_pallas.clear_cache()
    assert count == gold.size
    np.testing.assert_array_equal(keys, gold)


def test_pallas_sig_probe_matches_exact_search():
    """The round-4 signature-probe search (stop BFS at the 128-bucket
    level, 16-bit pair-packed run signatures, exact verify on the
    compacted tile) must be output-identical to the full BFS search.
    At (11,6,3) run spans exceed 2^16 so low-16 signature collisions
    (false positives) genuinely occur (~0.03% of windows, measured) and
    must be rejected by the compacted-tile verify."""
    rng = np.random.default_rng(7)
    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=7)
    codes = rng.integers(0, 4, size=400_000).astype(np.uint8)
    codes[rng.integers(0, codes.size, 150)] = 255
    old = sketch_pallas._SIG_ENABLE
    try:
        sketch_pallas._SIG_ENABLE = True
        keys_sig, count_sig = sketch_pallas.sketch_codes_pallas(
            codes, shuf, interpret=True)
        sketch_pallas._SIG_ENABLE = False
        keys_bfs, count_bfs = sketch_pallas.sketch_codes_pallas(
            codes, shuf, interpret=True)
    finally:
        sketch_pallas._SIG_ENABLE = old
    assert count_sig == count_bfs
    np.testing.assert_array_equal(keys_sig, keys_bfs)
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    np.testing.assert_array_equal(keys_sig, gold)


def test_pallas_multidevice_round_robin():
    """Stage-I sketching round-robins chunks across local devices
    (embarrassingly parallel, host-merged survivors): explicit
    multi-device dispatch must match single-device and golden.  The
    input must span MULTIPLE dispatch chunks or every chunk lands on
    devices[0] and the round-robin machinery goes untested."""
    import jax
    devs = jax.local_devices()
    assert len(devs) >= 2  # conftest forces 8 virtual CPU devices
    rng = np.random.default_rng(11)
    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=11)
    BW = sketch_pallas.RWIN * sketch_pallas.LANES
    n = 21 * BW + 1000          # plan [16, 4, 1] -> 3 chunks, 3 devices
    assert len(sketch_pallas._greedy_plan(-(-n // BW))) > 2
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    gold = np.sort(golden.window_drtuples(codes, shuf)).astype(np.uint32)
    keys, count = sketch_pallas.sketch_codes_pallas(
        codes, shuf, interpret=True, devices=devs)
    assert count == gold.size
    np.testing.assert_array_equal(keys, gold)
    # single-device and the devices=None auto-detect path must agree
    keys1, _ = sketch_pallas.sketch_codes_pallas(
        codes, shuf, interpret=True, devices=devs[:1])
    np.testing.assert_array_equal(keys1, keys)
    keys_auto, _ = sketch_pallas.sketch_codes_pallas(
        codes, shuf, interpret=True)
    np.testing.assert_array_equal(keys_auto, keys)
    # devices=[] falls back to single-device rather than crashing
    keys_e, _ = sketch_pallas.sketch_codes_pallas(
        codes, shuf, interpret=True, devices=[])
    np.testing.assert_array_equal(keys_e, keys)


def test_pallas_with_positions_matches_golden():
    """The survivor position channel (batched stage-I attribution) must
    produce the exact (drtuple, window position) multiset of the golden
    scan — including through the overflow rerun path."""
    rng = np.random.default_rng(13)
    shuf = make_shuf(SketchParams(k=11, subk=6, drlevel=3), seed=13)
    codes = rng.integers(0, 4, size=300_000).astype(np.uint8)
    codes[rng.integers(0, codes.size, 120)] = 255
    gdr, gpos = golden.window_drtuples(codes, shuf, return_positions=True)
    res = sketch_pallas.sketch_codes_pallas(
        codes, shuf, interpret=True, with_positions=True)
    assert res is not None
    dr, pos = res
    order = np.lexsort((dr, pos))
    gorder = np.lexsort((gdr, gpos))
    np.testing.assert_array_equal(pos[order], gpos[gorder])
    np.testing.assert_array_equal(dr[order],
                                  gdr[gorder].astype(np.uint32))
    # overflow rerun path: force a tiny slot budget
    old = sketch_pallas.CSLOT, sketch_pallas.MAXS
    sketch_pallas.CSLOT, sketch_pallas.MAXS = 1, 128
    sketch_pallas.sketch_tiles_compact_pallas.clear_cache()
    try:
        dr2, pos2 = sketch_pallas.sketch_codes_pallas(
            codes, shuf, interpret=True, with_positions=True)
    finally:
        sketch_pallas.CSLOT, sketch_pallas.MAXS = old
        sketch_pallas.sketch_tiles_compact_pallas.clear_cache()
    order2 = np.lexsort((dr2, pos2))
    np.testing.assert_array_equal(pos2[order2], gpos[gorder])
    np.testing.assert_array_equal(dr2[order2],
                                  gdr[gorder].astype(np.uint32))


def test_pallas_rejects_huge_accept_table():
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=0), seed=4)
    codes = np.zeros(1000, np.uint8)
    assert sketch_pallas.sketch_codes_pallas(codes, shuf,
                                             interpret=True) is None
