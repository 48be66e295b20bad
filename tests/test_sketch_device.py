"""Device (XLA) sketch kernel vs the golden NumPy model."""

import numpy as np
import pytest

from metakssd_tpu.params import SketchParams
from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.ops import golden, sketch_xla

from tests.util import random_seq, write_fasta
from metakssd_tpu.io import seqio


@pytest.mark.parametrize("k,subk,drlevel", [(8, 5, 2), (11, 6, 3), (10, 6, 2),
                                            (9, 6, 3)])
def test_device_matches_golden(k, subk, drlevel):
    rng = np.random.default_rng(k + drlevel)
    shuf = make_shuf(SketchParams(k=k, subk=subk, drlevel=drlevel), seed=k)
    codes = rng.integers(0, 4, size=100_000).astype(np.uint8)
    # sprinkle resets (N runs, record boundaries)
    codes[rng.integers(0, codes.size, 50)] = 255
    dr_gold = np.sort(golden.window_drtuples(codes, shuf))
    dr_dev = sketch_xla.sketch_codes(codes, shuf)
    np.testing.assert_array_equal(dr_gold, dr_dev)


def test_device_multichunk():
    """Streams larger than one chunk bucket must still match (overlap logic)."""
    rng = np.random.default_rng(0)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=5)
    codes = rng.integers(0, 4, size=(1 << 14) * 3 + 1234).astype(np.uint8)
    # force small chunks to exercise the overlap path
    orig = sketch_xla._MAX_CHUNK
    sketch_xla._MAX_CHUNK = 1 << 14
    try:
        dr_dev = sketch_xla.sketch_codes(codes, shuf)
    finally:
        sketch_xla._MAX_CHUNK = orig
    dr_gold = np.sort(golden.window_drtuples(codes, shuf))
    np.testing.assert_array_equal(dr_gold, dr_dev)


def test_device_modes_match_golden():
    rng = np.random.default_rng(1)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=2)
    g = random_seq(rng, 30000)
    reads = g + g[:10000]  # duplicates for uniq/occ modes
    codes = np.frombuffer(reads.encode(), dtype=np.uint8)
    codes = seqio.BASEMAP[codes]
    for mode, kw in [("set", {}), ("uniq", {}), ("occ", {"min_occ": 2}),
                     ("koc", {})]:
        a = golden.sketch_sets(codes, shuf, mode=mode, **kw)
        b = sketch_xla.sketch_to_sets(codes, shuf, mode=mode, **kw)
        for (ia, ca), (ib, cb) in zip(a, b):
            np.testing.assert_array_equal(ia, ib, err_msg=mode)
            if ca is not None:
                np.testing.assert_array_equal(ca, cb, err_msg=mode)


def test_stream_order_positions():
    rng = np.random.default_rng(4)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=9)
    codes = rng.integers(0, 4, size=20000).astype(np.uint8)
    pos, dr = sketch_xla.sketch_codes(codes, shuf, stream_order=True)
    dr_gold = golden.window_drtuples(codes, shuf)
    np.testing.assert_array_equal(dr, dr_gold)  # same stream order
    assert np.all(np.diff(pos) > 0)


def test_overflow_fallback_all_accepted():
    """drlevel=0 accepts every window -> the compact kernel overflows its
    survivor budget and must fall back to the exact full kernel."""
    rng = np.random.default_rng(7)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=0), seed=7)
    codes = rng.integers(0, 4, size=120_000).astype(np.uint8)
    dr_gold = np.sort(golden.window_drtuples(codes, shuf))
    assert dr_gold.size > codes.size * 0.9        # ~everything accepted
    dr_dev = sketch_xla.sketch_codes(codes, shuf)
    np.testing.assert_array_equal(dr_gold, dr_dev)
    # positions variant exercises its own fallback branch
    dr2, pos = sketch_xla.sketch_codes_with_positions(codes, shuf)
    np.testing.assert_array_equal(np.sort(dr2), dr_gold)
    assert pos.size == dr2.size
