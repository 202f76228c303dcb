"""Vectorized S2 cell-id math in pure numpy.

Implements the public S2 cell-id scheme (faces x quadratic ST projection x
Hilbert curve, 64-bit ids, levels 0..30) from the published description so
the engine can run where no S2 library exists. The reference engine leans on
vendored S2 for exactly these kernels (parent / range_min / range_max /
level: /root/reference/cpp/src/RoaringGeoMapReader.cpp:46-64, token tests
/root/reference/cpp/test/RoaringGeoMapWriterTest.cpp:219-227).

All kernels are numpy-vectorized over arrays of ids / coordinates — they are
meant to be called from Arrow-batched pandas UDFs (no per-row Python).

Ids are handled as ``np.uint64`` internally. Spark has no unsigned 64-bit
type, so ids cross the Spark boundary as two's-complement ``int64``
(``to_spark`` / ``from_spark``). The int64 view is order-preserving *within a
face* (faces 4 and 5 map to negative int64), which is all the engine's range
predicates ever need: descendant ranges [range_min, range_max] never cross a
face boundary.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL  # ij coordinate range

_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2

# pos -> ij (ij = 2*i + j) for each of the 4 orientations, and the
# orientation change applied by each sub-position (standard Hilbert tables).
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 2, 3, 1],  # axes swapped
        [3, 2, 0, 1],  # swapped & inverted
        [3, 1, 0, 2],  # inverted
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64
)

# _IJ_TO_POS[orientation][ij] = pos (inverse of _POS_TO_IJ)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _build_lookup_tables() -> tuple[np.ndarray, np.ndarray]:
    """4-bit-block Hilbert lookup tables (1024 entries each).

    lookup_pos[(ij << 2) | orig_orientation] = (pos << 2) | orientation
    lookup_ij [(pos << 2) | orig_orientation] = (ij << 2) | orientation
    where ij/pos are 8-bit (4 levels of 2 bits each).
    """
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
        else:
            level += 1
            i <<= 1
            j <<= 1
            pos <<= 2
            r = _POS_TO_IJ[orient]
            for sub in range(4):
                init(
                    level,
                    i + (int(r[sub]) >> 1),
                    j + (int(r[sub]) & 1),
                    orig,
                    pos + sub,
                    orient ^ int(_POS_TO_ORIENTATION[sub]),
                )

    init(0, 0, 0, 0, 0, 0)
    init(0, 0, 0, _SWAP_MASK, 0, _SWAP_MASK)
    init(0, 0, 0, _INVERT_MASK, 0, _INVERT_MASK)
    init(0, 0, 0, _SWAP_MASK | _INVERT_MASK, 0, _SWAP_MASK | _INVERT_MASK)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup_tables()


# ---------------------------------------------------------------------------
# lat/lng <-> xyz <-> face/(u,v) <-> (s,t) <-> (i,j)
# ---------------------------------------------------------------------------


def latlng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    """(N,) degrees -> (N, 3) unit vectors."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return np.stack(
        [cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)], axis=-1
    )


def xyz_to_latlng(xyz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, 3) vectors -> (lat_deg, lng_deg)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def xyz_to_face_uv(xyz: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(N, 3) -> (face, u, v) per the standard S2 face projection."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)

    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),  # face 0
            (lambda: -x / y, lambda: z / y),  # face 1
            (lambda: -x / z, lambda: -y / z),  # face 2
            (lambda: z / x, lambda: y / x),  # face 3
            (lambda: z / y, lambda: -x / y),  # face 4
            (lambda: -y / z, lambda: -x / z),  # face 5
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                uu, vv = ue(), ve()
            u = np.where(m, uu, u)
            v = np.where(m, vv, v)
    return face, u, v


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(face, u, v) -> (N, 3) unit vectors."""
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    comps = [
        (one, u, v),  # face 0
        (-u, one, v),  # face 1
        (-u, -v, one),  # face 2
        (-one, -v, -u),  # face 3
        (v, -one, -u),  # face 4
        (v, u, -one),  # face 5
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (cx, cy, cz) in enumerate(comps):
        m = face == f
        if m.any():
            x = np.where(m, cx, x)
            y = np.where(m, cy, y)
            z = np.where(m, cz, z)
    xyz = np.stack([x, y, z], axis=-1)
    return xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection u -> s (S2's default ST_UV transform)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Quadratic projection s -> u."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(np.asarray(s, dtype=np.float64) * MAX_SIZE), 0, MAX_SIZE - 1
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id (Hilbert curve)
# ---------------------------------------------------------------------------


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) cell ids from face/i/j. Vectorized port of the
    published FromFaceIJ loop (8 iterations of 4-bit lookup)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = face & _SWAP_MASK
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits = bits + (((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2))
        bits = bits + (((j >> (k * _LOOKUP_BITS)) & mask) << 2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits = bits & (_SWAP_MASK | _INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def to_face_ij(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell ids -> (face, i, j) of the leaf-aligned corner (ToFaceIJOrientation)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(POS_BITS)).astype(np.int64)
    bits = face & _SWAP_MASK
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        chunk = (
            (ids >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64)
            & ((1 << (2 * nbits)) - 1)
        ) << 2
        bits = _LOOKUP_IJ[bits + chunk]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits = bits & (_SWAP_MASK | _INVERT_MASK)
    return face, i, j


# ---------------------------------------------------------------------------
# id-level bit kernels (the reference's hot path, RoaringGeoMapReader.cpp:46-64)
# ---------------------------------------------------------------------------


def lsb(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids & (~ids + np.uint64(1))


def level(ids: np.ndarray) -> np.ndarray:
    """level = 30 - (trailing_zeros(id) / 2)."""
    ids = np.asarray(ids, dtype=np.uint64)
    low = lsb(ids)
    # log2 of an exact power of two <= 2^60 is float-exact
    tz = np.round(np.log2(low.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def lsb_for_level(lvl: np.ndarray) -> np.ndarray:
    lvl = np.asarray(lvl, dtype=np.int64)
    return np.uint64(1) << (np.uint64(2) * (np.uint64(MAX_LEVEL) - lvl.astype(np.uint64)))


def parent(ids: np.ndarray, lvl: np.ndarray) -> np.ndarray:
    """Ancestor of each id at (elementwise) level ``lvl``."""
    ids = np.asarray(ids, dtype=np.uint64)
    new_lsb = lsb_for_level(lvl)
    return (ids & (~new_lsb + np.uint64(1))) | new_lsb


def range_min(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids - (lsb(ids) - np.uint64(1))


def range_max(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids + (lsb(ids) - np.uint64(1))


def children(ids: np.ndarray) -> np.ndarray:
    """(N,) ids -> (N, 4) child ids one level down."""
    ids = np.asarray(ids, dtype=np.uint64)
    child_lsb = lsb(ids) >> np.uint64(2)
    offsets = np.array([-3, -1, 1, 3], dtype=np.int64)
    return ids[:, None] + (offsets[None, :] * child_lsb[:, None].astype(np.int64)).astype(
        np.uint64
    )


def contains(anc: np.ndarray, desc: np.ndarray) -> np.ndarray:
    """Elementwise: is ``desc`` inside ``anc``'s Hilbert range."""
    return (range_min(anc) <= np.asarray(desc, dtype=np.uint64)) & (
        np.asarray(desc, dtype=np.uint64) <= range_max(anc)
    )


def is_valid(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    face_ok = (ids >> np.uint64(POS_BITS)) <= np.uint64(5)
    # lsb must be at an even bit position: lsb & 0b01010...101 pattern
    even_bits = np.uint64(0x5555555555555555)
    return face_ok & ((lsb(ids) & even_bits) != 0)


# ---------------------------------------------------------------------------
# high-level conversions
# ---------------------------------------------------------------------------


def latlng_to_cell(
    lat_deg: np.ndarray, lng_deg: np.ndarray, lvl: int = MAX_LEVEL
) -> np.ndarray:
    """lat/lng degrees -> cell id at ``lvl`` (leaf by default)."""
    xyz = latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(xyz)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = from_face_ij(face, i, j)
    if lvl >= MAX_LEVEL:
        return leaf
    return parent(leaf, np.full(leaf.shape, lvl, dtype=np.int64))


def cell_to_center_xyz(ids: np.ndarray) -> np.ndarray:
    """Cell ids -> unit-vector centers (S2CellId::ToPointRaw semantics)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face, i, j = to_face_ij(ids)
    is_leaf = (ids & np.uint64(1)) != 0
    # center correction: leaf -> +1; otherwise +2 or 0 by parity trick
    delta = np.where(
        is_leaf,
        1,
        np.where(((i ^ (ids.astype(np.int64) >> 2)) & 1) != 0, 2, 0),
    )
    si = 2 * i + delta
    ti = 2 * j + delta
    u = st_to_uv(si.astype(np.float64) / (2.0 * MAX_SIZE))
    v = st_to_uv(ti.astype(np.float64) / (2.0 * MAX_SIZE))
    return face_uv_to_xyz(face, u, v)


def cell_to_latlng(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return xyz_to_latlng(cell_to_center_xyz(ids))


def cell_corners_xyz(ids: np.ndarray) -> np.ndarray:
    """(N,) ids -> (N, 4, 3) unit-vector corners (lower-left CCW)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face, i, j = to_face_ij(ids)
    lvl = level(ids)
    size = np.int64(1) << (MAX_LEVEL - lvl)  # ij extent of the cell
    # leaf-aligned corner is (i, j); cell spans [i0, i0+size) where i0 = i & -size
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    corners = []
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        si = (i0 + di * size).astype(np.float64) / MAX_SIZE
        tj = (j0 + dj * size).astype(np.float64) / MAX_SIZE
        corners.append(face_uv_to_xyz(face, st_to_uv(si), st_to_uv(tj)))
    return np.stack(corners, axis=1)


# ---------------------------------------------------------------------------
# tokens and the Spark int64 boundary
# ---------------------------------------------------------------------------


def token_to_id(tokens: list[str] | np.ndarray) -> np.ndarray:
    """S2 tokens (hex, trailing zeros stripped) -> uint64 ids."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for k, t in enumerate(tokens):
        t = str(t)
        out[k] = np.uint64(0) if t in ("", "X", "x") else np.uint64(int(t.ljust(16, "0"), 16))
    return out


def id_to_token(ids: np.ndarray) -> list[str]:
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    return [f"{int(v):016x}".rstrip("0") or "X" for v in ids]


def to_spark(ids: np.ndarray) -> np.ndarray:
    """uint64 ids -> two's-complement int64 for Spark storage."""
    return np.asarray(ids, dtype=np.uint64).view(np.int64)


def from_spark(ids: np.ndarray) -> np.ndarray:
    """int64 Spark values -> uint64 ids."""
    return np.asarray(ids, dtype=np.int64).view(np.uint64)


# ---------------------------------------------------------------------------
# level-lattice quantization (reference Denormalize semantics, SURVEY §1.4)
# ---------------------------------------------------------------------------

MIN_LEVEL = 3  # RoaringGeoMapWriter.cpp:10 / RoaringGeoMapReader.cpp:6


def lattice_levels(bucket: int) -> np.ndarray:
    """The quantized index levels {3, 3+m, 3+2m, ...} for bucket range m."""
    return np.arange(MIN_LEVEL, MAX_LEVEL + 1, bucket, dtype=np.int64)


def snap_level_up(lvl: np.ndarray, bucket: int) -> np.ndarray:
    """Smallest lattice level >= lvl (clamped to MIN_LEVEL).

    Mirrors S2CellUnion::Denormalize(MIN_LEVEL, bucket): a cell at a
    non-lattice level is replaced by descendants at the next lattice level.
    """
    lvl = np.asarray(lvl, dtype=np.int64)
    snapped = MIN_LEVEL + ((np.maximum(lvl, MIN_LEVEL) - MIN_LEVEL + bucket - 1) // bucket) * bucket
    return np.minimum(snapped, MAX_LEVEL)


def denormalize(ids: np.ndarray, bucket: int) -> np.ndarray:
    """Replace each cell with descendants at its snapped lattice level.

    Returns a flat uint64 array (variable fan-out, 4^(delta) per cell).
    Equivalent to S2CellUnion::Denormalize(MIN_LEVEL=3, bucket) as used at
    RoaringGeoMapWriter.cpp:21 and RoaringGeoMapReader.cpp:41-43.
    """
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    lvl = level(ids)
    target = snap_level_up(lvl, bucket)
    out: list[np.ndarray] = []
    pending = ids
    pending_target = target
    pending_lvl = lvl
    while len(pending):
        done = pending_lvl >= pending_target
        out.append(pending[done])
        todo = ~done
        if not todo.any():
            break
        kids = children(pending[todo]).reshape(-1)
        pending_target = np.repeat(pending_target[todo], 4)
        pending_lvl = np.repeat(pending_lvl[todo] + 1, 4)
        pending = kids
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint64)


def ancestors_at_lattice(ids: np.ndarray, bucket: int) -> tuple[np.ndarray, np.ndarray]:
    """All lattice-level ancestors of each id (levels < id's level, >= 3).

    Returns (flat ancestor ids, index of the source id for each ancestor).
    Mirrors the reader's ancestor walk (RoaringGeoMapReader.cpp:57-64).
    """
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    lvl = level(ids)
    levels = lattice_levels(bucket)
    anc_list: list[np.ndarray] = []
    src_list: list[np.ndarray] = []
    for lv in levels:
        m = lvl > lv
        if not m.any():
            continue
        anc_list.append(parent(ids[m], np.full(int(m.sum()), lv, dtype=np.int64)))
        src_list.append(np.nonzero(m)[0])
    if not anc_list:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    return np.concatenate(anc_list), np.concatenate(src_list)
