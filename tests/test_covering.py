"""Property tests for rgm.covering (SURVEY §5 item 2/4): soundness (cover
contains every interior point), budget, tightness sanity, refinement
agreement with the oracle predicates."""

import numpy as np
import pytest

from rgm import cellmath as cm
from rgm import covering as cov
from rgm import geo

RNG = np.random.default_rng(42)

# reference bench shape: 1 km circles in the contiguous US
# (/root/reference/cpp/benchmarks/main.cpp:22-25,145-146)
US = dict(lat_lo=24.396308, lat_hi=49.384358, lng_lo=-125.0, lng_hi=-66.93457)

TRIANGLE = [[37.7749, -122.4194], [34.0522, -118.2437], [36.1699, -115.1398]]


def _sample_in_cap(clat, clng, radius_m, n):
    # rejection-free: uniform in small disc (planar approx then verify)
    ang = RNG.uniform(0, 2 * np.pi, n * 2)
    r = radius_m * np.sqrt(RNG.uniform(0, 1, n * 2))
    lat = clat + (r / 111_000.0) * np.sin(ang)
    lng = clng + (r / (111_000.0 * np.cos(np.radians(clat)))) * np.cos(ang)
    ok = geo.points_in_cap(lat, lng, clat, clng, radius_m)
    return lat[ok][:n], lng[ok][:n]


def _covered(cover, lat, lng):
    leafs = cm.latlng_to_cell(lat, lng)
    rmin, rmax = cm.range_min(cover), cm.range_max(cover)
    return ((leafs[:, None] >= rmin[None, :]) & (leafs[:, None] <= rmax[None, :])).any(axis=1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_cap_cover_sound_and_bounded(seed):
    rng = np.random.default_rng(seed)
    clat = rng.uniform(US["lat_lo"], US["lat_hi"])
    clng = rng.uniform(US["lng_lo"], US["lng_hi"])
    radius = rng.uniform(200, 50_000)
    cover = cov.cover_cap(clat, clng, radius, max_cells=30)
    assert 0 < len(cover) <= 30
    assert cm.is_valid(cover).all()
    lat, lng = _sample_in_cap(clat, clng, radius, 500)
    assert _covered(cover, lat, lng).all(), "cap cover missed interior points"


def test_cap_cover_disjoint_cells():
    cover = cov.cover_cap(37.7749, -122.4194, 1000.0, max_cells=30)
    rmin, rmax = cm.range_min(cover), cm.range_max(cover)
    overlap = (rmin[:, None] <= rmax[None, :]) & (rmax[:, None] >= rmin[None, :])
    np.fill_diagonal(overlap, False)
    assert not overlap.any()


def test_cap_cover_tightness():
    """A 1 km cap with 30 cells should not cover more than ~100x its area."""
    cover = cov.cover_cap(40.0, -100.0, 1000.0, max_cells=30)
    # leaf-count area -> steradian-ish proxy: sum of 4^-level
    lv = cm.level(cover)
    cover_area = (4.0 ** (-lv.astype(float))).sum() * 4 * np.pi / 6 * (2**60 / 2**60)
    cap_area = np.pi * (1000.0 / geo.EARTH_RADIUS_M) ** 2
    assert cover_area < 150 * cap_area, f"cover too loose: {cover_area / cap_area:.1f}x"


def test_polygon_cover_sound():
    cover = cov.cover_polygon(TRIANGLE, max_cells=100)
    assert 0 < len(cover) <= 100
    w = RNG.dirichlet([1, 1, 1], 2000)
    pts = w @ np.asarray(TRIANGLE)
    got = _covered(cover, pts[:, 0], pts[:, 1])
    assert got.all(), f"polygon cover missed {(~got).sum()} interior points"


def test_rect_cover_sound():
    r = dict(lat_lo=0.0, lat_hi=1.0, lng_lo=0.0, lng_hi=1.0)
    cover = cov.cover_rect(**r, max_cells=10)
    assert 0 < len(cover) <= 10
    lat = RNG.uniform(0, 1, 1000)
    lng = RNG.uniform(0, 1, 1000)
    assert _covered(cover, lat, lng).all()


def test_point_cover_is_leaf():
    c = cov.cover_region({"kind": "point", "lat": 37.7749, "lng": -122.4194})
    assert len(c) == 1 and cm.level(c)[0] == 30
    assert c[0] == np.uint64(9260949627242122337)


def test_south_pole_miss():
    """Suite C (RoaringGeoMapWriterTest.cpp:96-124): SF cap cover must not
    contain the South Pole's leaf cell."""
    cover = cov.cover_cap(37.7749, -122.4194, 1000.0, max_cells=30)
    sp = cm.latlng_to_cell(np.array([-90.0]), np.array([0.0]))
    assert not _covered(cover, np.array([-90.0]), np.array([0.0])).any()
    # and no ancestor/descendant relation either
    anc, _ = cm.ancestors_at_lattice(sp, 3)
    assert not np.isin(anc, cover).any()


def test_refinement_matches_oracle_cap():
    spec = {"kind": "cap", "lat": 36.0, "lng": -115.0, "radius_m": 25_000}
    lat = RNG.uniform(35.0, 37.0, 5000)
    lng = RNG.uniform(-116.0, -114.0, 5000)
    got = cov.points_in_region(lat, lng, spec)
    want = geo.haversine_m(lat, lng, 36.0, -115.0) <= 25_000
    np.testing.assert_array_equal(got, want)


def test_refinement_matches_oracle_polygon():
    spec = {"kind": "polygon", "verts": TRIANGLE}
    lat = RNG.uniform(33.0, 39.0, 5000)
    lng = RNG.uniform(-124.0, -114.0, 5000)
    got = cov.points_in_region(lat, lng, spec)
    # independent matplotlib-free oracle: winding via shoelace half-plane for
    # convex triangle
    v = np.asarray(TRIANGLE)
    def side(p1, p2, y, x):
        return (p2[1] - p1[1]) * (y - p1[0]) - (p2[0] - p1[0]) * (x - p1[1])
    s1 = side(v[0], v[1], lat, lng)
    s2 = side(v[1], v[2], lat, lng)
    s3 = side(v[2], v[0], lat, lng)
    want = ((s1 >= 0) & (s2 >= 0) & (s3 >= 0)) | ((s1 <= 0) & (s2 <= 0) & (s3 <= 0))
    # allow disagreement only within float-eps of an edge
    disagree = got != want
    assert disagree.mean() < 0.001


def test_cover_region_dispatch_and_cell_kind():
    cell = cm.latlng_to_cell(np.array([40.0]), np.array([-100.0]), 10)[0]
    c = cov.cover_region({"kind": "cell", "cell_id": int(cell)})
    assert c[0] == cell
    inside_lat, inside_lng = cm.cell_to_latlng(np.array([cell]))
    assert cov.points_in_region(inside_lat, inside_lng, {"kind": "cell", "cell_id": int(cell)}).all()


def test_batch_cap_covers_match_single():
    rng = np.random.default_rng(9)
    clat = rng.uniform(US["lat_lo"], US["lat_hi"], 20)
    clng = rng.uniform(US["lng_lo"], US["lng_hi"], 20)
    r = rng.uniform(500, 20_000, 20)
    reg, cells = cov.cover_caps_batch(clat, clng, r, max_cells=30)
    for i in range(20):
        single = np.sort(cov.cover_cap(clat[i], clng[i], r[i], max_cells=30))
        batch = np.sort(cells[reg == i])
        np.testing.assert_array_equal(single, batch)


def test_batch_rect_covers_match_single():
    rng = np.random.default_rng(10)
    lo_lat = rng.uniform(25, 45, 10)
    lo_lng = rng.uniform(-120, -80, 10)
    reg, cells = cov.cover_rects_batch(lo_lat, lo_lat + 0.5, lo_lng, lo_lng + 0.5, max_cells=20)
    for i in range(10):
        single = np.sort(
            cov.cover_rect(lo_lat[i], lo_lat[i] + 0.5, lo_lng[i], lo_lng[i] + 0.5, max_cells=20)
        )
        np.testing.assert_array_equal(single, np.sort(cells[reg == i]))


def test_batch_polygon_covers_match_single():
    """cover_polygons_batch must be BIT-identical per region to the scalar
    cover_polygon BFS (same classify formulas via geo.rects_vs_rings), over
    mixed vertex counts, both windings, degenerate collinear rings, and
    per-region max_cells budgets."""
    rng = np.random.default_rng(21)
    rings = []
    for i in range(40):
        m = int(rng.integers(3, 12))
        clat = rng.uniform(-65, 65)
        clng = rng.uniform(-170, 170)
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        if i % 2:
            ang = ang[::-1]  # CW winding
        r = rng.uniform(0.05, 3.0)
        rings.append(
            np.stack([clat + r * np.sin(ang), clng + r * np.cos(ang)], axis=1)
        )
    rings.append(np.array([[10.0, 20.0], [10.0, 21.0], [10.0, 22.0]]))  # collinear
    rings.append(np.array([[5.0, 5.0], [5.5, 5.5]]))  # 2-vertex degenerate
    # planar-lng edge shapes: dateline-spanning and near-polar rings (the
    # engine's region semantics are planar lat/lng — the contract here is
    # only batch == scalar, whatever the scalar planar semantics yield)
    rings.append(
        np.array([[10.0, 179.5], [10.0, -179.5], [11.0, -179.5], [11.0, 179.5]])
    )
    rings.append(np.array([[88.5, -120.0], [88.5, 0.0], [89.5, 0.0], [89.5, 120.0]]))
    mcs = rng.integers(4, 60, len(rings))

    reg, cells = cov.cover_polygons_batch(rings, mcs)
    order = np.argsort(reg, kind="stable")
    reg, cells = reg[order], cells[order]
    bounds = np.searchsorted(reg, np.arange(len(rings) + 1))
    for i, v in enumerate(rings):
        single = cov.cover_polygon(v, int(mcs[i]))
        np.testing.assert_array_equal(single, cells[bounds[i] : bounds[i + 1]])


def test_rects_vs_rings_matches_scalar_kernels():
    """geo.rects_vs_rings row i == (rect_intersects_polygon,
    rect_inside_polygon) of rect i vs ring i."""
    rng = np.random.default_rng(22)
    n = 300
    lat_lo = rng.uniform(-60, 60, n)
    lng_lo = rng.uniform(-170, 170, n)
    lat_hi = lat_lo + rng.uniform(0.01, 2.0, n)
    lng_hi = lng_lo + rng.uniform(0.01, 2.0, n)
    m = 7
    rings = np.empty((n, m, 2))
    for i in range(n):
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = rng.uniform(0.05, 4.0)
        cy = lat_lo[i] + rng.uniform(-1.0, 1.0)
        cx = lng_lo[i] + rng.uniform(-1.0, 1.0)
        rings[i, :, 0] = cy + r * np.sin(ang)
        rings[i, :, 1] = cx + r * np.cos(ang)

    inter_b, inside_b = geo.rects_vs_rings(lat_lo, lat_hi, lng_lo, lng_hi, rings)
    for i in range(n):
        inter_s = geo.rect_intersects_polygon(
            lat_lo[i : i + 1], lat_hi[i : i + 1], lng_lo[i : i + 1], lng_hi[i : i + 1],
            rings[i],
        )[0]
        inside_s = geo.rect_inside_polygon(
            lat_lo[i : i + 1], lat_hi[i : i + 1], lng_lo[i : i + 1], lng_hi[i : i + 1],
            rings[i],
        )[0]
        assert inter_b[i] == inter_s and inside_b[i] == inside_s, i
    assert inter_b.any() and (~inter_b).any()  # the sample exercises both
