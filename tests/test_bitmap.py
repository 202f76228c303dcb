"""Unit tests for the roaring-style codec (SURVEY §5 item 2)."""

import numpy as np
import pytest

from rgm import bitmap as bm


@pytest.mark.parametrize("n", [0, 1, 10, 4095, 4096, 100_000])
def test_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    vals = rng.integers(0, 2**32 - 1, n, dtype=np.uint32) if n else np.empty(0, np.uint32)
    blob = bm.encode(vals)
    got = bm.decode(blob)
    want = np.unique(vals)
    np.testing.assert_array_equal(got, want)
    assert bm.cardinality(blob) == len(want)


def test_dense_container_roundtrip():
    # one 16-bit container, fully dense -> bitset path
    vals = np.arange(70_000, dtype=np.uint32)
    blob = bm.encode(vals)
    np.testing.assert_array_equal(bm.decode(blob), vals)
    # dense encoding is compact: 65536 values in first container -> 8KiB not 128KiB
    assert len(blob) < 8192 + 4096 * 2 + 64


def test_union_many():
    rng = np.random.default_rng(3)
    sets = [rng.integers(0, 10_000, 500, dtype=np.uint32) for _ in range(20)]
    blob = bm.union_many([bm.encode(s) for s in sets])
    want = np.unique(np.concatenate(sets))
    np.testing.assert_array_equal(bm.decode(blob), want)


def test_intersect_difference_contains():
    a = bm.encode(np.array([1, 5, 70_000, 2**31], dtype=np.uint32))
    b = bm.encode(np.array([5, 70_000, 9], dtype=np.uint32))
    np.testing.assert_array_equal(bm.decode(bm.intersect(a, b)), [5, 70_000])
    np.testing.assert_array_equal(bm.decode(bm.difference(a, b)), [1, 2**31])
    assert bm.contains_value(a, 2**31) and not bm.contains_value(a, 2)


def test_empty_union():
    assert bm.cardinality(bm.union_many([])) == 0
    assert bm.union_values([bm.encode(np.empty(0, np.uint32))]).size == 0
