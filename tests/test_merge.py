"""Merge-path membership kernel vs numpy (interpret mode)."""

import numpy as np
import pytest

from metakssd_tpu.ops import merge


def _check(haystack, values, needles, **kw):
    m, v = merge.sorted_membership(haystack, values, needles, **kw)
    if haystack.size:
        pos = np.searchsorted(haystack, needles)
        pos = np.minimum(pos, haystack.size - 1)
        em = haystack[pos] == needles
        ev = np.where(em, values[pos], 0)
    else:
        em = np.zeros(needles.size, bool)
        ev = np.zeros(needles.size, np.uint32)
    np.testing.assert_array_equal(m, em)
    np.testing.assert_array_equal(v, ev)


def test_fallback_small():
    rng = np.random.default_rng(0)
    hay = np.unique(rng.integers(0, 1 << 20, 500, dtype=np.uint32))
    val = rng.integers(1, 100, hay.size, dtype=np.uint32)
    needles = np.sort(rng.integers(0, 1 << 20, 300, dtype=np.uint32))
    _check(hay, val, needles)


def test_pallas_interpret_membership():
    rng = np.random.default_rng(1)
    hay = np.unique(rng.integers(0, 1 << 26, 50_000, dtype=np.uint32))
    val = rng.integers(1, 1000, hay.size, dtype=np.uint32)
    # needles: mixture of hits and misses, sorted
    hits = rng.choice(hay, 3000, replace=False)
    misses = rng.integers(0, 1 << 26, 5000, dtype=np.uint32)
    needles = np.sort(np.concatenate([hits, misses]).astype(np.uint32))
    _check(hay, val, needles, use_pallas=True, interpret=True)


def test_pallas_interpret_dense_overflow():
    """Query locally denser than the window: overflow fallback path."""
    rng = np.random.default_rng(2)
    # haystack strongly clustered so some needle blocks span > 2W entries
    hay = np.unique(np.concatenate([
        rng.integers(0, 1 << 14, 40_000, dtype=np.uint32),     # dense
        rng.integers(1 << 28, 1 << 29, 10_000, dtype=np.uint32)]))
    val = rng.integers(1, 9, hay.size, dtype=np.uint32)
    needles = np.sort(np.concatenate([
        np.array([0, 1, 2], dtype=np.uint32),
        rng.integers(1 << 28, 1 << 29, 4096, dtype=np.uint32)]))
    _check(hay, val, needles, use_pallas=True, interpret=True)


def test_empty_inputs():
    _check(np.zeros(0, np.uint32), np.zeros(0, np.uint32),
           np.sort(np.arange(10, dtype=np.uint32)))
    _check(np.arange(100, dtype=np.uint32),
           np.arange(100, dtype=np.uint32), np.zeros(0, np.uint32))
