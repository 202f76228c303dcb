"""Golden + property tests for rgm.cellmath (SURVEY §5 suites E/F).

Golden vectors come from the reference's own tests:
- the 35 S2 tokens at cpp/test/RoaringGeoMapWriterTest.cpp:219-227
- the fixed cell id 9260949627242122337 at go/roaringgeomap_test.go:18,
  which (decoded) is exactly the level-30 leaf of the San Francisco point
  (37.7749, -122.4194) used throughout the reference tests — an independent
  cross-check of the whole lat/lng -> Hilbert-id pipeline.
"""

import numpy as np
import pytest

from rgm import cellmath as cm

TOKENS_35 = [
    "80c462b4", "80c462cc", "80c462d4", "80c462d9", "80c4633",
    "80c4634c", "80c46354", "80c464ac", "80c47854", "80c478d",
    "80c478f", "80c4794", "80c4799", "80c479b", "80c47a3",
    "80c47a5", "80c47ae2b", "80c47afc", "80c47b4", "80c47bc",
    "80c47d", "80c47e1", "80c47e3fc", "80c47e5", "80c47e7",
    "80c47ec", "80c47f04", "80c47f1c", "80c47f3", "80c4875c",
    "80c48764", "80c4877c", "80c48784", "80c4878c", "80c487f54",
]
GO_FIXED_CELL = np.uint64(9260949627242122337)  # go/roaringgeomap_test.go:18
SF = (37.7749, -122.4194)


def test_token_roundtrip():
    ids = cm.token_to_id(TOKENS_35)
    assert cm.id_to_token(ids) == TOKENS_35
    assert cm.is_valid(ids).all()


def test_go_fixed_cell_is_sf_leaf():
    g = np.array([GO_FIXED_CELL])
    assert cm.is_valid(g).all()
    assert cm.level(g)[0] == 30
    lat, lng = cm.cell_to_latlng(g)
    assert abs(lat[0] - SF[0]) < 1e-6 and abs(lng[0] - SF[1]) < 1e-6
    # and the forward direction reproduces the id exactly
    leaf = cm.latlng_to_cell(np.array([SF[0]]), np.array([SF[1]]))
    assert leaf[0] == GO_FIXED_CELL


def test_token_cells_decode_to_known_region():
    """The 35 golden cells tile a small blob near (34.85, -117.05)."""
    ids = cm.token_to_id(TOKENS_35)
    lat, lng = cm.cell_to_latlng(ids)
    assert (np.abs(lat - 34.87) < 0.15).all()
    assert (np.abs(lng + 117.06) < 0.15).all()
    # exact spot-checks (golden, computed once and frozen)
    assert cm.level(ids[:5]).tolist() == [13, 13, 13, 14, 12]
    np.testing.assert_allclose(lat[0], 34.8424, atol=5e-4)
    np.testing.assert_allclose(lng[0], -116.9794, atol=5e-4)


def test_token_cells_mutually_disjoint():
    """A valid covering is disjoint: no token cell contains another."""
    ids = cm.token_to_id(TOKENS_35)
    rmin, rmax = cm.range_min(ids), cm.range_max(ids)
    overlap = (rmin[:, None] <= rmax[None, :]) & (rmax[:, None] >= rmin[None, :])
    np.fill_diagonal(overlap, False)
    assert not overlap.any()


def test_level_parent_range_consistency():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89, 89, 5000)
    lng = rng.uniform(-180, 180, 5000)
    leaf = cm.latlng_to_cell(lat, lng)
    assert (cm.level(leaf) == 30).all()
    for lvl in (0, 3, 9, 17, 29):
        p = cm.parent(leaf, np.full(leaf.shape, lvl))
        assert (cm.level(p) == lvl).all()
        assert cm.contains(p, leaf).all()
        assert (cm.range_min(p) <= p).all() and (p <= cm.range_max(p)).all()
        kids = cm.children(p)
        assert (cm.level(kids.ravel()) == lvl + 1).all()
        assert cm.contains(np.repeat(p, 4), kids.ravel()).all()


def test_center_roundtrip_all_levels():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89, 89, 1000)
    lng = rng.uniform(-180, 180, 1000)
    for lvl in (2, 5, 12, 21, 30):
        cell = cm.latlng_to_cell(lat, lng, lvl)
        clat, clng = cm.cell_to_latlng(cell)
        again = cm.latlng_to_cell(clat, clng, lvl)
        assert (cell == again).all(), f"center roundtrip failed at level {lvl}"


def test_spark_int64_boundary_faces_4_and_5():
    """Faces 4/5 ids exceed 2^63; two's-complement view must roundtrip and
    preserve within-face range ordering."""
    lat = np.array([-80.0, -10.0, 35.0])  # southern / pacific points on high faces
    lng = np.array([100.0, -150.0, -117.0])
    leaf = cm.latlng_to_cell(lat, lng)
    s = cm.to_spark(leaf)
    assert (cm.from_spark(s) == leaf).all()
    p = cm.parent(leaf, np.full(3, 8))
    lo, hi = cm.to_spark(cm.range_min(p)), cm.to_spark(cm.range_max(p))
    sl = cm.to_spark(leaf)
    assert ((lo <= sl) & (sl <= hi)).all()


def test_corners_contain_center():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 200)
    lng = rng.uniform(-180, 180, 200)
    for lvl in (4, 10, 16):
        cell = cm.latlng_to_cell(lat, lng, lvl)
        corners = cm.cell_corners_xyz(cell)
        center = cm.cell_to_center_xyz(cell)
        # center is within the corner hull: angle(center, corner) < max corner-corner angle
        d_cc = np.einsum("nkd,nd->nk", corners, center)
        assert (d_cc > 0.5).all()
        # all 4 corners distinct
        for a in range(4):
            for b in range(a + 1, 4):
                assert (np.abs(corners[:, a] - corners[:, b]).sum(axis=1) > 1e-12).all()


def test_denormalize_lattice():
    ids = cm.token_to_id(TOKENS_35)
    out = cm.denormalize(ids, bucket=3)
    lv = cm.level(out)
    assert (((lv - 3) % 3 == 0) & (lv >= 3)).all()
    # every output cell is a descendant-or-self of some input cell
    rmin, rmax = cm.range_min(ids), cm.range_max(ids)
    covered = ((out[:, None] >= rmin[None, :]) & (out[:, None] <= rmax[None, :])).any(axis=1)
    assert covered.all()
    # and the union of outputs covers every input cell exactly
    # (leaf-count area preserved: a cell at level l holds lsb(id) leaves)
    assert cm.lsb(ids).sum() == cm.lsb(out).sum()


def test_ancestors_at_lattice():
    ids = cm.token_to_id(["80c47ae2b"])  # level 16
    anc, src = cm.ancestors_at_lattice(ids, bucket=3)
    assert (src == 0).all()
    assert sorted(cm.level(anc).tolist()) == [3, 6, 9, 12, 15]
    assert cm.contains(anc, np.repeat(ids, len(anc))).all()


def test_snap_level_up():
    lv = np.array([0, 2, 3, 4, 5, 6, 7, 29, 30])
    np.testing.assert_array_equal(
        cm.snap_level_up(lv, 3), np.array([3, 3, 3, 6, 6, 6, 9, 30, 30])
    )
    np.testing.assert_array_equal(cm.snap_level_up(lv, 1), np.maximum(lv, 3))
