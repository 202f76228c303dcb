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


def _encode_sorted_groups_scalar(keys_sorted, starts, ends):
    """Reference implementation (the pre-r5 per-group loop) for the
    vectorized encode_sorted_groups equivalence test."""
    keys_sorted = np.asarray(keys_sorted, dtype=np.uint32)
    high = (keys_sorted >> np.uint32(16)).astype(np.uint16)
    low = (keys_sorted & np.uint32(0xFFFF)).astype(np.uint16)
    one = np.uint32(1).tobytes()
    blobs, cards = [], []
    for s, e in zip(starts, ends):
        cnt = int(e - s)
        if cnt and cnt < bm._ARRAY_MAX and high[s] == high[e - 1]:
            hdr = np.zeros(1, dtype=bm._HDR)
            hdr["key"] = high[s]
            hdr["kind"] = bm._ARRAY
            hdr["count"] = cnt
            blobs.append(one + hdr.tobytes() + low[s:e].tobytes())
            cards.append(cnt)
        else:
            b = bm.encode(keys_sorted[s:e])
            blobs.append(b)
            cards.append(bm.cardinality(b))
    return blobs, cards


def test_encode_sorted_groups_vectorized_matches_scalar():
    """The r5 vectorized group encoder is byte-identical to the scalar
    reference on randomized group mixes (singletons, mixed-high groups
    that straddle the 16-bit boundary, dense >= ARRAY_MAX groups, empty
    groups) and decodes back to the exact inputs."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        n_groups = int(rng.integers(1, 1500))
        sizes = rng.choice([0, 1, 1, 1, 2, 3, 10, 300, 5000], size=n_groups)
        groups = []
        for s in sizes:
            base = int(rng.integers(0, 1 << 31))
            g = np.unique(
                rng.integers(base, base + max(10 * int(s), 70_000), size=int(s)).astype(np.uint32)
            ) if s else np.empty(0, np.uint32)
            groups.append(np.sort(g))
        sizes = np.array([len(g) for g in groups])
        flat = np.concatenate(groups) if groups else np.empty(0, np.uint32)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        b_ref, c_ref = _encode_sorted_groups_scalar(flat, starts, ends)
        b_vec, c_vec = bm.encode_sorted_groups(flat, starts, ends)
        assert b_vec == b_ref, trial
        assert list(c_vec) == c_ref, trial
        for g, b in zip(groups, b_vec):
            np.testing.assert_array_equal(bm.decode(b), g)


def test_decode_many_matches_per_blob_decode():
    """The r5 batch decoder equals per-blob decode() on a mix of empty,
    single-array, multi-container and bitset blobs, with correct blob
    indices."""
    rng = np.random.default_rng(9)
    blobs, want_v, want_r = [], [], []
    for i in range(400):
        shape = i % 5
        if shape == 0:
            vals = np.empty(0, np.uint32)
        elif shape in (1, 2):  # single array container (the mass case)
            base = int(rng.integers(0, 1 << 16)) << 16
            vals = np.unique(rng.integers(base, base + 60_000, size=int(rng.integers(1, 50))).astype(np.uint32))
        elif shape == 3:  # multi-container
            vals = np.unique(rng.integers(0, 1 << 22, size=200).astype(np.uint32))
        else:  # dense bitset container
            vals = np.arange(70_000, dtype=np.uint32)
        blobs.append(bm.encode(vals))
        want_v.append(vals)
        want_r.append(np.full(len(vals), i, np.int64))
    got_v, got_r = bm.decode_many(blobs)
    # order within decode_many is fast-path-first; compare as (row, value) sets
    got = sorted(zip(got_r.tolist(), got_v.tolist()))
    want = sorted(zip(np.concatenate(want_r).tolist(), np.concatenate(want_v).tolist()))
    assert got == want
    # per-row equality too
    for i in range(400):
        np.testing.assert_array_equal(np.sort(got_v[got_r == i]), want_v[i])
