"""Roaring-style posting-list codec in numpy.

Re-expresses the reference's posting-list algebra (CRoaring bitmaps keyed by
cell: /root/reference/cpp/src/RoaringGeoMapWriter.cpp:46-59 build,
RoaringGeoMapReader.cpp:70-82 fastunion) without native libraries: values are
uint32 key_ids, split into 16-bit-keyed containers, each stored as a sorted
uint16 array (< 4096 values) or an 8 KiB bitset (>= 4096), mirroring the
published Roaring format's two dense/sparse container kinds.

Blob layout (little-endian):
    u32 n_containers
    per container: u16 high_key | u8 kind (0=array, 1=bitset) | u32 count
    payloads concatenated (array: count*u16; bitset: 8192 bytes)

All kernels operate on numpy arrays; the Spark UDAF path wraps them in
grouped pandas functions (rgm.index). Cardinality reads only the header.
"""

from __future__ import annotations

import numpy as np

_ARRAY, _BITSET = 0, 1
_ARRAY_MAX = 4096  # container flips to bitset at this cardinality
_HDR = np.dtype([("key", "<u2"), ("kind", "u1"), ("count", "<u4")])


def encode(values: np.ndarray) -> bytes:
    """Sorted-unique-encode a uint32 value set into a blob."""
    vals = np.unique(np.asarray(values, dtype=np.uint32))
    if len(vals) == 0:
        return np.uint32(0).tobytes()
    high = (vals >> np.uint32(16)).astype(np.uint16)
    low = (vals & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(high, return_index=True)
    ends = np.append(starts[1:], len(vals))
    counts = ends - starts
    hdr = np.empty(len(keys), dtype=_HDR)
    hdr["key"] = keys
    hdr["count"] = counts
    hdr["kind"] = np.where(counts < _ARRAY_MAX, _ARRAY, _BITSET)
    payloads: list[bytes] = []
    for k in range(len(keys)):
        lo = low[starts[k] : ends[k]]
        if hdr["kind"][k] == _ARRAY:
            payloads.append(lo.tobytes())
        else:
            bs = np.zeros(1024, dtype=np.uint64)
            np.bitwise_or.at(
                bs, (lo >> np.uint16(6)).astype(np.int64), np.uint64(1) << (lo & np.uint16(63)).astype(np.uint64)
            )
            payloads.append(bs.tobytes())
    return np.uint32(len(keys)).tobytes() + hdr.tobytes() + b"".join(payloads)


def encode_sorted_groups(
    keys_sorted: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[list[bytes], np.ndarray]:
    """Encode many posting lists at once from one globally-sorted uint32 key
    array with per-group [start, end) bounds (keys sorted and UNIQUE within
    each group).

    Fully vectorized fast path (r5: the per-group Python loop here was the
    single largest CPU sink of the postings build stage — ~4 groups per
    posting row x 10^6s of rows): key_ids are assigned in min-cell order
    (spatial clustering, reference A2), so a cell's keys usually share
    their high 16 bits and fit one array container. ALL such groups are
    assembled into ONE contiguous byte buffer with numpy index math
    (headers via strided fancy assignment, payloads via a single gather),
    then sliced into per-group bytes — the only remaining per-group work
    is one C-level bytes slice. Mixed-high or dense groups fall back to
    encode(). Returns (blobs, cardinalities ndarray).
    """
    keys_sorted = np.asarray(keys_sorted, dtype=np.uint32)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n = len(starts)
    high = (keys_sorted >> np.uint32(16)).astype(np.uint16)
    low = (keys_sorted & np.uint32(0xFFFF)).astype(np.uint16)
    cnts = ends - starts
    fast = (cnts > 0) & (cnts < _ARRAY_MAX)
    nz = cnts > 0
    fast[nz] &= high[starts[nz]] == high[ends[nz] - 1]

    blobs = np.empty(n, dtype=object)
    cards = cnts.copy()

    sf, cf = starts[fast], cnts[fast]
    if len(sf):
        hsz = _HDR.itemsize
        lens = 4 + hsz + 2 * cf
        offs = np.concatenate([[0], np.cumsum(lens)])
        buf = np.zeros(offs[-1], dtype=np.uint8)
        o = offs[:-1]
        buf[o] = 1  # u32 n_containers = 1 (LE; the other 3 bytes stay 0)
        H = np.zeros(len(sf), dtype=_HDR)
        H["key"] = high[sf]
        H["kind"] = _ARRAY
        H["count"] = cf
        buf[o[:, None] + np.arange(4, 4 + hsz)] = H.view(np.uint8).reshape(len(sf), hsz)
        total = int(cf.sum())
        csum = np.concatenate([[0], np.cumsum(cf)[:-1]])
        gather = np.repeat(sf - csum, cf) + np.arange(total)
        pay8 = np.ascontiguousarray(low[gather]).view(np.uint8)  # LE u16 bytes
        csum2 = np.concatenate([[0], np.cumsum(2 * cf)[:-1]])
        dst = np.repeat(o + 4 + hsz - csum2, 2 * cf) + np.arange(2 * total)
        buf[dst] = pay8
        bts = buf.tobytes()
        blobs[fast] = [bts[a:b] for a, b in zip(offs[:-1].tolist(), offs[1:].tolist())]
    for i in np.nonzero(~fast)[0]:
        b = encode(keys_sorted[starts[i] : ends[i]])
        blobs[i] = b
        cards[i] = cardinality(b)
    return list(blobs), cards


def decode_many(blobs) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY blobs at once -> (values uint32, blob_index int64).

    Vectorized fast path for the dominant blob shape (one array container):
    all such blobs' headers and payloads are parsed with numpy index math
    over one concatenated buffer — no per-blob Python. Multi-container and
    bitset blobs fall back to decode(). Empty blobs contribute nothing.

    This is the r5 batch analog of decode() for the bitmap-union query
    path (count_keys): a 2,000-query count previously paid a Python
    decode per matched posting row."""
    m = len(blobs)
    if m == 0:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    lens = np.fromiter((len(b) for b in blobs), np.int64, m)
    offs = np.concatenate([[0], np.cumsum(lens)])
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    o = offs[:-1]
    hsz = _HDR.itemsize
    ncont = (
        buf[o].astype(np.uint32)
        | (buf[o + 1].astype(np.uint32) << 8)
        | (buf[o + 2].astype(np.uint32) << 16)
        | (buf[o + 3].astype(np.uint32) << 24)
    )
    has_hdr = lens >= 4 + hsz
    kind = np.full(m, 255, np.uint8)
    kind[has_hdr] = buf[o[has_hdr] + 6]
    fast = (ncont == 1) & (kind == _ARRAY)
    parts_v: list[np.ndarray] = []
    parts_r: list[np.ndarray] = []
    if fast.any():
        of = o[fast]
        cnt = (
            buf[of + 7].astype(np.int64)
            | (buf[of + 8].astype(np.int64) << 8)
            | (buf[of + 9].astype(np.int64) << 16)
            | (buf[of + 10].astype(np.int64) << 24)
        )
        key = (
            buf[of + 4].astype(np.uint32) | (buf[of + 5].astype(np.uint32) << 8)
        ) << np.uint32(16)
        total = int(cnt.sum())
        csum = np.concatenate([[0], np.cumsum(2 * cnt)[:-1]])
        src = np.repeat(of + 4 + hsz - csum, 2 * cnt) + np.arange(2 * total)
        pay = buf[src]
        lo = pay[0::2].astype(np.uint32) | (pay[1::2].astype(np.uint32) << 8)
        parts_v.append(np.repeat(key, cnt) | lo)
        parts_r.append(np.repeat(np.nonzero(fast)[0], cnt))
    for i in np.nonzero(~fast & (ncont > 0))[0]:
        v = decode(blobs[i])
        parts_v.append(v)
        parts_r.append(np.full(len(v), i, np.int64))
    if not parts_v:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    return np.concatenate(parts_v), np.concatenate(parts_r)


def decode(blob: bytes) -> np.ndarray:
    """Blob -> sorted uint32 value array."""
    n = int(np.frombuffer(blob, dtype="<u4", count=1)[0])
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    hdr = np.frombuffer(blob, dtype=_HDR, count=n, offset=4)
    off = 4 + hdr.nbytes
    out: list[np.ndarray] = []
    for k in range(n):
        high = np.uint32(hdr["key"][k]) << np.uint32(16)
        if hdr["kind"][k] == _ARRAY:
            cnt = int(hdr["count"][k])
            lo = np.frombuffer(blob, dtype="<u2", count=cnt, offset=off)
            off += 2 * cnt
        else:
            bs = np.frombuffer(blob, dtype="<u8", count=1024, offset=off)
            off += 8192
            # unpack set bits: little-endian within each u64 word
            bits = np.unpackbits(bs.view(np.uint8), bitorder="little")
            lo = np.nonzero(bits)[0].astype(np.uint16)
        out.append(high | lo.astype(np.uint32))
    return np.concatenate(out)


def cardinality(blob: bytes) -> int:
    """Value count, header-only (no payload decode)."""
    n = int(np.frombuffer(blob, dtype="<u4", count=1)[0])
    if n == 0:
        return 0
    hdr = np.frombuffer(blob, dtype=_HDR, count=n, offset=4)
    return int(hdr["count"].sum())


def union_many(blobs) -> bytes:
    """OR of many blobs (the reference's fastunion, RoaringGeoMapReader.cpp:81)."""
    parts = [decode(b) for b in blobs if b is not None]
    if not parts:
        return encode(np.empty(0, dtype=np.uint32))
    return encode(np.concatenate(parts))


def union_values(blobs) -> np.ndarray:
    parts = [decode(b) for b in blobs if b is not None]
    if not parts:
        return np.empty(0, dtype=np.uint32)
    return np.unique(np.concatenate(parts))


def intersect(a: bytes, b: bytes) -> bytes:
    return encode(np.intersect1d(decode(a), decode(b)))


def difference(a: bytes, b: bytes) -> bytes:
    return encode(np.setdiff1d(decode(a), decode(b)))


def contains_value(blob: bytes, value: int) -> bool:
    vals = decode(blob)
    i = np.searchsorted(vals, np.uint32(value))
    return bool(i < len(vals) and vals[i] == np.uint32(value))
