"""Geometry predicates (numpy-vectorized): distances, point-in-polygon,
rect/segment intersection.

Region semantics used across the engine:
- ``cap``     spherical cap: great-circle distance(point, center) <= radius.
- ``rect``    lat/lng axis-aligned box (inclusive).
- ``polygon`` planar lat/lng polygon (ray casting; boundary counts as inside
              within float tolerance). The reference tests use small
              (sub-continental) polygons where this matches spherical
              semantics for every asserted case.

These same predicates are used both by the covering generator (conservative
cell tests) and by the exact refinement step after the index join, so engine
results equal the brute-force oracle by construction.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_010.0  # mean Earth radius (S2Earth convention)


def angle_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Great-circle angle (radians) between unit vectors. Broadcasts."""
    dot = np.sum(a * b, axis=-1)
    cross = np.linalg.norm(np.cross(a, b), axis=-1)
    return np.arctan2(cross, dot)


def haversine_rad(
    lat1: np.ndarray, lng1: np.ndarray, lat2: np.ndarray, lng2: np.ndarray
) -> np.ndarray:
    """Great-circle angle (radians) between lat/lng points in degrees."""
    p1, l1, p2, l2 = (np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lng1, lat2, lng2))
    dlat = p2 - p1
    dlng = l2 - l1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlng / 2.0) ** 2
    return 2.0 * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def haversine_m(lat1, lng1, lat2, lng2) -> np.ndarray:
    return haversine_rad(lat1, lng1, lat2, lng2) * EARTH_RADIUS_M


def points_in_cap(
    lat: np.ndarray, lng: np.ndarray, clat: float, clng: float, radius_m: float
) -> np.ndarray:
    return haversine_m(lat, lng, clat, clng) <= radius_m


def points_in_rect(
    lat: np.ndarray, lng: np.ndarray, lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float
) -> np.ndarray:
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    return (lat >= lat_lo) & (lat <= lat_hi) & (lng >= lng_lo) & (lng <= lng_hi)


def points_in_polygon(lat: np.ndarray, lng: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Ray-casting point-in-polygon in the lat/lng plane.

    verts: (M, 2) array of (lat, lng) ring vertices (closed implicitly).
    Vectorized over N points; boundary points count as inside (<= on the
    crossing test plus an explicit on-edge check with tolerance).
    """
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lng = np.atleast_1d(np.asarray(lng, dtype=np.float64))
    verts = np.asarray(verts, dtype=np.float64)
    vy, vx = verts[:, 0], verts[:, 1]  # y = lat, x = lng
    vy2, vx2 = np.roll(vy, -1), np.roll(vx, -1)

    y = lat[:, None]
    x = lng[:, None]
    # crossing test (half-open rule avoids double-count at vertices)
    cond = (vy[None, :] > y) != (vy2[None, :] > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = vx[None, :] + (y - vy[None, :]) / (vy2[None, :] - vy[None, :]) * (
            vx2[None, :] - vx[None, :]
        )
    crossings = (cond & (x < x_int)).sum(axis=1)
    inside = (crossings % 2) == 1

    # boundary tolerance: point on an edge counts as inside
    ex = vx2[None, :] - vx[None, :]
    ey = vy2[None, :] - vy[None, :]
    px = x - vx[None, :]
    py = y - vy[None, :]
    seg_len2 = ex * ex + ey * ey
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip((px * ex + py * ey) / np.where(seg_len2 == 0, 1.0, seg_len2), 0.0, 1.0)
    dx = px - t * ex
    dy = py - t * ey
    on_edge = ((dx * dx + dy * dy) < 1e-18).any(axis=1)
    return inside | on_edge


def segments_cross(
    a1: np.ndarray, a2: np.ndarray, b1: np.ndarray, b2: np.ndarray
) -> np.ndarray:
    """Proper/improper 2D segment intersection test. Inputs broadcast;
    each is (..., 2) as (y, x)."""

    def orient(p, q, r):
        return (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0]) - (
            q[..., 0] - p[..., 0]
        ) * (r[..., 1] - p[..., 1])

    d1 = orient(b1, b2, a1)
    d2 = orient(b1, b2, a2)
    d3 = orient(a1, a2, b1)
    d4 = orient(a1, a2, b2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    def on_seg(p, q, r):  # r collinear with pq and within bbox
        return (
            (np.minimum(p[..., 0], q[..., 0]) <= r[..., 0])
            & (r[..., 0] <= np.maximum(p[..., 0], q[..., 0]))
            & (np.minimum(p[..., 1], q[..., 1]) <= r[..., 1])
            & (r[..., 1] <= np.maximum(p[..., 1], q[..., 1]))
        )

    touch = (
        ((d1 == 0) & on_seg(b1, b2, a1))
        | ((d2 == 0) & on_seg(b1, b2, a2))
        | ((d3 == 0) & on_seg(a1, a2, b1))
        | ((d4 == 0) & on_seg(a1, a2, b2))
    )
    return proper | touch


def rect_intersects_polygon(
    lat_lo: np.ndarray,
    lat_hi: np.ndarray,
    lng_lo: np.ndarray,
    lng_hi: np.ndarray,
    verts: np.ndarray,
) -> np.ndarray:
    """Exact rect-vs-polygon intersection in the lat/lng plane.

    Rect arrays are (N,); verts is (M, 2). True if any polygon vertex is in
    the rect, any rect corner is in the polygon, or any edges cross.
    """
    lat_lo, lat_hi, lng_lo, lng_hi = (
        np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in (lat_lo, lat_hi, lng_lo, lng_hi)
    )
    verts = np.asarray(verts, dtype=np.float64)
    # polygon vertex inside rect
    v_in = (
        (verts[None, :, 0] >= lat_lo[:, None])
        & (verts[None, :, 0] <= lat_hi[:, None])
        & (verts[None, :, 1] >= lng_lo[:, None])
        & (verts[None, :, 1] <= lng_hi[:, None])
    ).any(axis=1)

    # rect corner inside polygon
    corners_lat = np.stack([lat_lo, lat_lo, lat_hi, lat_hi], axis=1)  # (N,4)
    corners_lng = np.stack([lng_lo, lng_hi, lng_hi, lng_lo], axis=1)
    c_in = points_in_polygon(corners_lat.ravel(), corners_lng.ravel(), verts).reshape(
        -1, 4
    ).any(axis=1)

    # edge crossings: 4 rect edges x M polygon edges
    n = len(lat_lo)
    rc = np.stack([corners_lat, corners_lng], axis=-1)  # (N,4,2) as (y,x)
    r1 = rc  # edges corner k -> corner (k+1)%4
    r2 = np.roll(rc, -1, axis=1)
    p1 = np.stack([verts[:, 0], verts[:, 1]], axis=-1)  # (M,2)
    p2 = np.roll(p1, -1, axis=0)
    cross = segments_cross(
        r1[:, :, None, :],  # (N,4,1,2)
        r2[:, :, None, :],
        p1[None, None, :, :],  # (1,1,M,2)
        p2[None, None, :, :],
    ).reshape(n, -1).any(axis=1)
    return v_in | c_in | cross


def rect_inside_polygon(
    lat_lo: np.ndarray,
    lat_hi: np.ndarray,
    lng_lo: np.ndarray,
    lng_hi: np.ndarray,
    verts: np.ndarray,
) -> np.ndarray:
    """True where the whole rect is inside the polygon: all 4 corners in
    polygon and no polygon edge crosses the rect."""
    lat_lo, lat_hi, lng_lo, lng_hi = (
        np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in (lat_lo, lat_hi, lng_lo, lng_hi)
    )
    verts = np.asarray(verts, dtype=np.float64)
    corners_lat = np.stack([lat_lo, lat_lo, lat_hi, lat_hi], axis=1)
    corners_lng = np.stack([lng_lo, lng_hi, lng_hi, lng_lo], axis=1)
    all_in = points_in_polygon(corners_lat.ravel(), corners_lng.ravel(), verts).reshape(
        -1, 4
    ).all(axis=1)

    rc = np.stack([corners_lat, corners_lng], axis=-1)
    r1, r2 = rc, np.roll(rc, -1, axis=1)
    p1 = verts
    p2 = np.roll(verts, -1, axis=0)
    crossed = segments_cross(
        r1[:, :, None, :], r2[:, :, None, :], p1[None, None, :, :], p2[None, None, :, :]
    ).reshape(len(lat_lo), -1).any(axis=1)
    return all_in & ~crossed


def rects_vs_rings(
    lat_lo: np.ndarray,
    lat_hi: np.ndarray,
    lng_lo: np.ndarray,
    lng_hi: np.ndarray,
    rings: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched exact rect-vs-ring tests: row i pairs rect i with ring
    ``rings[i]`` ((P, M, 2) lat/lng vertices, closed implicitly).

    Returns ``(intersects, inside)``, elementwise equal to
    ``rect_intersects_polygon`` / ``rect_inside_polygon`` applied row by
    row (same formulas evaluated per element, so bit-identical): shared
    sub-predicates — ring vertex in rect, the 4 rect corners vs the ring
    by half-open ray casting with the on-edge tolerance, and the 4 rect
    edges vs all M ring edges through ``segments_cross``.
    """
    lat_lo, lat_hi, lng_lo, lng_hi = (
        np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in (lat_lo, lat_hi, lng_lo, lng_hi)
    )
    rings = np.asarray(rings, dtype=np.float64)
    p = len(lat_lo)
    vy = rings[:, :, 0]  # (P, M)
    vx = rings[:, :, 1]
    vy2 = np.roll(vy, -1, axis=1)
    vx2 = np.roll(vx, -1, axis=1)

    # ring vertex inside rect
    v_in = (
        (vy >= lat_lo[:, None])
        & (vy <= lat_hi[:, None])
        & (vx >= lng_lo[:, None])
        & (vx <= lng_hi[:, None])
    ).any(axis=1)

    # the 4 rect corners vs own ring (points_in_polygon per pair, same
    # corner order as the scalar kernels)
    cy = np.stack([lat_lo, lat_lo, lat_hi, lat_hi], axis=1)  # (P, 4)
    cx = np.stack([lng_lo, lng_hi, lng_hi, lng_lo], axis=1)
    y = cy[:, :, None]  # (P, 4, 1)
    x = cx[:, :, None]
    vyb, vxb = vy[:, None, :], vx[:, None, :]  # (P, 1, M)
    vy2b, vx2b = vy2[:, None, :], vx2[:, None, :]
    cond = (vyb > y) != (vy2b > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = vxb + (y - vyb) / (vy2b - vyb) * (vx2b - vxb)
    inside_c = ((cond & (x < x_int)).sum(axis=2) % 2) == 1  # (P, 4)
    ex = vx2b - vxb
    ey = vy2b - vyb
    wx = x - vxb
    wy = y - vyb
    seg2 = ex * ex + ey * ey
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip((wx * ex + wy * ey) / np.where(seg2 == 0, 1.0, seg2), 0.0, 1.0)
    dx = wx - t * ex
    dy = wy - t * ey
    on_edge = ((dx * dx + dy * dy) < 1e-18).any(axis=2)  # (P, 4)
    c_in = inside_c | on_edge

    # 4 rect edges x M ring edges
    rc = np.stack([cy, cx], axis=-1)  # (P, 4, 2) as (y, x)
    r1, r2 = rc, np.roll(rc, -1, axis=1)
    p1 = np.stack([vy, vx], axis=-1)  # (P, M, 2) as (y, x)
    p2 = np.stack([vy2, vx2], axis=-1)
    cross = segments_cross(
        r1[:, :, None, :], r2[:, :, None, :], p1[:, None, :, :], p2[:, None, :, :]
    ).reshape(p, -1).any(axis=1)

    intersects = v_in | c_in.any(axis=1) | cross
    inside = c_in.all(axis=1) & ~cross
    return intersects, inside


def polygons_edges_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """True if any edge of ring a intersects (incl. touches) any edge of
    ring b. Rings are (M, 2) (lat, lng) arrays, closed implicitly."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a1, a2 = a, np.roll(a, -1, axis=0)
    b1, b2 = b, np.roll(b, -1, axis=0)
    return bool(
        segments_cross(
            a1[:, None, :], a2[:, None, :], b1[None, :, :], b2[None, :, :]
        ).any()
    )


def polygon_intersects_polygon(a: np.ndarray, b: np.ndarray) -> bool:
    """Planar lat/lng ring intersection: edges cross, or either ring's first
    vertex lies inside the other (covers full containment either way)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if polygons_edges_cross(a, b):
        return True
    if bool(points_in_polygon(a[:1, 0], a[:1, 1], b)[0]):
        return True
    return bool(points_in_polygon(b[:1, 0], b[:1, 1], a)[0])


def polygon_inside_polygon(inner: np.ndarray, outer: np.ndarray) -> bool:
    """All inner vertices inside outer and no edge intersections. Engine
    semantic: an inner ring touching the outer boundary is NOT contained."""
    inner = np.asarray(inner, dtype=np.float64)
    outer = np.asarray(outer, dtype=np.float64)
    return bool(
        points_in_polygon(inner[:, 0], inner[:, 1], outer).all()
        and not polygons_edges_cross(inner, outer)
    )


M_PER_DEG_LAT = 111_194.9


def point_to_ring_dist_m(py: float, px: float, vy: np.ndarray, vx: np.ndarray) -> float:
    """Min planar distance (meters via local lat scaling) from a point to a
    ring's boundary — the shared helper for cap-vs-rect/polygon refinement."""
    scale_x = M_PER_DEG_LAT * np.cos(np.radians(py))
    ey = (np.roll(vy, -1) - vy) * M_PER_DEG_LAT
    ex = (np.roll(vx, -1) - vx) * scale_x
    wy = (py - vy) * M_PER_DEG_LAT
    wx = (px - vx) * scale_x
    seg2 = ey**2 + ex**2
    t = np.clip((wy * ey + wx * ex) / np.where(seg2 == 0, 1.0, seg2), 0.0, 1.0)
    return float(np.sqrt((wy - t * ey) ** 2 + (wx - t * ex) ** 2).min())


def point_to_verts_maxdist_m(py: float, px: float, vy: np.ndarray, vx: np.ndarray) -> float:
    """Max planar distance from a point to ring VERTICES — the farthest point
    of a convex-or-not ring from an external/internal point is at a vertex,
    which is what cap-contains-ring needs."""
    scale_x = M_PER_DEG_LAT * np.cos(np.radians(py))
    wy = (py - vy) * M_PER_DEG_LAT
    wx = (px - vx) * scale_x
    return float(np.sqrt(wy**2 + wx**2).max())


def points_to_ring_dist_m(
    py: np.ndarray, px: np.ndarray, vy: np.ndarray, vx: np.ndarray
) -> np.ndarray:
    """Vectorized point_to_ring_dist_m: N points vs ONE ring -> (N,) min
    planar distances. Same local-lat scaling formula per point, so each
    element equals the scalar kernel exactly."""
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    scale_x = (M_PER_DEG_LAT * np.cos(np.radians(py)))[:, None]  # (N,1)
    ey = ((np.roll(vy, -1) - vy) * M_PER_DEG_LAT)[None, :]  # (1,M)
    ex = (np.roll(vx, -1) - vx)[None, :] * scale_x  # (N,M)
    wy = (py[:, None] - vy[None, :]) * M_PER_DEG_LAT
    wx = (px[:, None] - vx[None, :]) * scale_x
    seg2 = ey**2 + ex**2
    t = np.clip((wy * ey + wx * ex) / np.where(seg2 == 0, 1.0, seg2), 0.0, 1.0)
    return np.sqrt((wy - t * ey) ** 2 + (wx - t * ex) ** 2).min(axis=1)


def _own_ring_edges(
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Edge arrays for a ragged batch of rings (one ring per row).

    ``offsets`` is the (n+1,) vertex-boundary array; ring i's vertices are
    flat[offsets[i]:offsets[i+1]]. Returns (vy1, vx1, vy2, vx2, row_of) for
    every edge, with the last edge of each ring wrapping to its first
    vertex — the ragged equivalent of np.roll(v, -1)."""
    n = len(offsets) - 1
    total = len(flat_vy)
    nxt = np.arange(1, total + 1)
    ends = offsets[1:]
    starts = offsets[:-1]
    nxt[ends - 1] = starts  # wrap each ring's last vertex to its first
    row_of = np.repeat(np.arange(n), np.diff(offsets))
    return flat_vy, flat_vx, flat_vy[nxt], flat_vx[nxt], row_of


def points_to_own_ring_dist_m(
    py: np.ndarray, px: np.ndarray,
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray,
) -> np.ndarray:
    """Min planar distance from point i to ITS OWN ring i (ragged batch) —
    the vectorized form of looping point_to_ring_dist_m per row. One pass
    over all edges + a segment-min (minimum.reduceat) per ring."""
    py = np.asarray(py, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    vy1, vx1, vy2, vx2, row_of = _own_ring_edges(flat_vy, flat_vx, offsets)
    scale_x = M_PER_DEG_LAT * np.cos(np.radians(py))[row_of]
    ey = (vy2 - vy1) * M_PER_DEG_LAT
    ex = (vx2 - vx1) * scale_x
    wy = (py[row_of] - vy1) * M_PER_DEG_LAT
    wx = (px[row_of] - vx1) * scale_x
    seg2 = ey**2 + ex**2
    t = np.clip((wy * ey + wx * ex) / np.where(seg2 == 0, 1.0, seg2), 0.0, 1.0)
    d = np.sqrt((wy - t * ey) ** 2 + (wx - t * ex) ** 2)
    return np.minimum.reduceat(d, offsets[:-1])


def points_to_own_verts_maxdist_m(
    py: np.ndarray, px: np.ndarray,
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray,
) -> np.ndarray:
    """Max planar distance from point i to its own ring i's VERTICES
    (ragged batch) — vectorized point_to_verts_maxdist_m."""
    py = np.asarray(py, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    row_of = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    scale_x = M_PER_DEG_LAT * np.cos(np.radians(py))[row_of]
    wy = (py[row_of] - flat_vy) * M_PER_DEG_LAT
    wx = (px[row_of] - flat_vx) * scale_x
    return np.maximum.reduceat(np.sqrt(wy**2 + wx**2), offsets[:-1])


def polygons_edges_cross_ring(
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray,
    qring: np.ndarray,
) -> np.ndarray:
    """Per-ring bool (n,): does ANY edge of ragged ring i intersect (incl.
    touch) any edge of the single ring ``qring`` ((M, 2) lat/lng)? The
    batched form of polygons_edges_cross — one segments_cross pass over
    all E own-ring edges x M query edges, then a segment-any per ring."""
    vy1, vx1, vy2, vx2, _ = _own_ring_edges(flat_vy, flat_vx, offsets)
    a1 = np.stack([vy1, vx1], axis=-1)
    a2 = np.stack([vy2, vx2], axis=-1)
    b1 = np.asarray(qring, dtype=np.float64)
    b2 = np.roll(b1, -1, axis=0)
    hit = segments_cross(
        a1[:, None, :], a2[:, None, :], b1[None, :, :], b2[None, :, :]
    ).any(axis=1)
    return np.add.reduceat(hit.astype(np.int64), offsets[:-1]) > 0


def polygons_intersect_ring(
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray,
    qring: np.ndarray,
) -> np.ndarray:
    """Vectorized polygon_intersects_polygon(ring_i, qring) for a ragged
    batch of rings vs ONE query ring: edges cross, or ring i's first
    vertex is inside qring, or qring's first vertex is inside ring i —
    element-for-element equal to the scalar form (same sub-predicates)."""
    qring = np.asarray(qring, dtype=np.float64)
    n = len(offsets) - 1
    firsts = offsets[:-1]
    cross = polygons_edges_cross_ring(flat_vy, flat_vx, offsets, qring)
    a_in_q = points_in_polygon(flat_vy[firsts], flat_vx[firsts], qring)
    q_in_a = points_in_own_polygon(
        np.full(n, qring[0, 0]), np.full(n, qring[0, 1]),
        flat_vy, flat_vx, offsets,
    )
    return cross | a_in_q | q_in_a


def polygons_inside_ring(
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray,
    qring: np.ndarray,
) -> np.ndarray:
    """Vectorized polygon_inside_polygon(ring_i, qring): ALL of ring i's
    vertices inside qring and no edge intersections (touching the boundary
    is NOT contained — same engine semantic as the scalar form)."""
    qring = np.asarray(qring, dtype=np.float64)
    v_in = points_in_polygon(flat_vy, flat_vx, qring)
    all_in = np.add.reduceat((~v_in).astype(np.int64), offsets[:-1]) == 0
    return all_in & ~polygons_edges_cross_ring(flat_vy, flat_vx, offsets, qring)


def points_in_own_polygon(
    py: np.ndarray, px: np.ndarray,
    flat_vy: np.ndarray, flat_vx: np.ndarray, offsets: np.ndarray,
) -> np.ndarray:
    """Ray-casting point-in-polygon where point i tests against ITS OWN
    ring i (ragged batch). Matches points_in_polygon semantics exactly:
    half-open crossing rule + on-edge tolerance counts as inside."""
    py = np.asarray(py, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    vy1, vx1, vy2, vx2, row_of = _own_ring_edges(flat_vy, flat_vx, offsets)
    y = py[row_of]
    x = px[row_of]
    cond = (vy1 > y) != (vy2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = vx1 + (y - vy1) / (vy2 - vy1) * (vx2 - vx1)
    crossed = (cond & (x < x_int)).astype(np.int64)
    crossings = np.add.reduceat(crossed, offsets[:-1])
    inside = (crossings % 2) == 1

    ex = vx2 - vx1
    ey = vy2 - vy1
    wx = x - vx1
    wy = y - vy1
    seg2 = ex * ex + ey * ey
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip((wx * ex + wy * ey) / np.where(seg2 == 0, 1.0, seg2), 0.0, 1.0)
    dx = wx - t * ex
    dy = wy - t * ey
    on_edge = (
        np.add.reduceat(((dx * dx + dy * dy) < 1e-18).astype(np.int64), offsets[:-1]) > 0
    )
    return inside | on_edge
