"""Pure-numpy XXH64 (the public xxHash algorithm), bit-identical to Spark's
``xxhash64`` expression on string inputs (Spark hashes the UTF-8 bytes with
seed 42).

Exists so oracles/fixtures can recompute token/gram hashes INDEPENDENTLY of
the Spark runtime (DuckDB has no xxhash64): tools/make_fixtures.py derives
golden simhash/fingerprint values from this implementation, and
tests/test_training_ops.py golden-tests it against the Spark expression.

Vectorized over same-length byte rows — hashing millions of short grams is
a few numpy passes, not a Python loop per input.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = 42


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _le64(data: np.ndarray, off: int) -> np.ndarray:
    return np.ascontiguousarray(data[:, off : off + 8]).view("<u8").ravel()


def _le32(data: np.ndarray, off: int) -> np.ndarray:
    return np.ascontiguousarray(data[:, off : off + 4]).view("<u4").ravel().astype(np.uint64)


def xxh64_same_len(data: np.ndarray, seed: int = SPARK_SEED) -> np.ndarray:
    """XXH64 of every row of an (N, L) uint8 matrix -> uint64[N]."""
    assert data.dtype == np.uint8 and data.ndim == 2
    n, length = data.shape
    s = np.uint64(seed)
    with np.errstate(over="ignore"):
        off = 0
        if length >= 32:
            v1 = np.full(n, s + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(n, s + _P2, dtype=np.uint64)
            v3 = np.full(n, s, dtype=np.uint64)
            v4 = np.full(n, s - _P1, dtype=np.uint64)
            while off + 32 <= length:
                v1 = _rotl(v1 + _le64(data, off) * _P2, 31) * _P1
                v2 = _rotl(v2 + _le64(data, off + 8) * _P2, 31) * _P1
                v3 = _rotl(v3 + _le64(data, off + 16) * _P2, 31) * _P1
                v4 = _rotl(v4 + _le64(data, off + 24) * _P2, 31) * _P1
                off += 32
            h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                h ^= _rotl(v * _P2, 31) * _P1
                h = h * _P1 + _P4
        else:
            h = np.full(n, s + _P5, dtype=np.uint64)
        h = h + np.uint64(length)
        while off + 8 <= length:
            k = _rotl(_le64(data, off) * _P2, 31) * _P1
            h = _rotl(h ^ k, 27) * _P1 + _P4
            off += 8
        if off + 4 <= length:
            h = _rotl(h ^ (_le32(data, off) * _P1), 23) * _P2 + _P3
            off += 4
        while off < length:
            h = _rotl(h ^ (data[:, off].astype(np.uint64) * _P5), 11) * _P1
            off += 1
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h


def xxh64_bytes(items: list[bytes], seed: int = SPARK_SEED) -> np.ndarray:
    """XXH64 of each byte string -> int64[N] (two's complement, Spark's
    LongType view of the uint64 hash). Groups by length and vectorizes."""
    n = len(items)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        if length == 0:
            out[idx] = xxh64_same_len(np.zeros((len(idx), 0), dtype=np.uint8), seed)
            continue
        mat = np.frombuffer(
            b"".join(items[i] for i in idx), dtype=np.uint8
        ).reshape(len(idx), int(length))
        out[idx] = xxh64_same_len(mat, seed)
    return out.view(np.int64)


def xxh64_str(items: list[str], seed: int = SPARK_SEED) -> np.ndarray:
    return xxh64_bytes([s.encode("utf-8") for s in items], seed)


def xxh64_int64(values, seed: int = SPARK_SEED) -> np.ndarray:
    """XXH64 of each int64 value's 8-byte little-endian representation ->
    int64[N] — bit-identical to Spark's ``xxhash64`` on a BIGINT column
    (Spark's hashLong specialization is the one-lane <32-byte path over the
    LE bytes; golden-tested in tests/test_training_ops.py). Used by
    fixture generators to mirror the engine's deterministic hash samples
    (e.g. IVF training) without a Spark runtime."""
    a = np.ascontiguousarray(np.asarray(values, dtype=np.int64))
    return xxh64_same_len(a.view(np.uint8).reshape(-1, 8), seed).view(np.int64)
