"""End-to-end parity suites (SURVEY §5.3 / FIXTURES.md §4).

Recreates the reference's four gtest scenarios + the Go round-trip as Spark
jobs on synthetic tables and asserts identical key sets, with a brute-force
geometric oracle for ground truth:

- suite A single_cell  (RoaringGeoMapWriterTest.cpp:11-40)
- suite B polygon_contains (RoaringGeoMapWriterTest.cpp:42-94)
- suite C miss         (RoaringGeoMapWriterTest.cpp:96-124)
- suite E fixed_cell   (go/roaringgeomap_test.go:9-46)
- suite D us_20k       (RoaringGeoMapWriterTest.cpp:168-246) in test_parity_us.py
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rgm import cellmath as cm
from rgm import index as ridx
from rgm import query as rq

SF = (37.7749, -122.4194)


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    """Suite A/C fixture: one point key at SF (bucket=1 in the reference;
    we keep bucket=3 and rely on lattice semantics) plus a polygon key
    (suite B) and a fixed-cell key (suite E)."""
    out = str(tmp_path_factory.mktemp("idx") / "small")
    rows = [
        # suite A: single point at SF
        ("single-id", "point", SF[0], SF[1], None, None),
        # suite B: 1x1 degree square polygon at (0,0)-(1,1), max_cells=10
        ("polygon-id", "polygon", None, None,
         [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]], 10),
        # suite E: fixed cell id (the go test indexes this exact cell)
        ("fixed-a", "cell", None, None, None, None),
        ("fixed-b", "cell", None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "key string, kind string, lat double, lng double, "
        "verts array<array<double>>, max_cells int"
    )
    fixed = int(np.uint64(9260949627242122337).view(np.int64))
    df = df.withColumn(
        "cell_id",
        F.when(F.col("key").startswith("fixed"), F.lit(fixed)).otherwise(F.lit(None)),
    )
    ridx.build_index(spark, df, "key", out, bucket=3, max_cells=10, n_buckets=4)
    return out


def _q(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_suite_a_single_cell(spark, small_index):
    """Query = same SF point -> exactly the single-id key (plus the fixed
    cell keys, which sit on the same leaf: the go test cell IS the SF leaf)."""
    q = _q(spark, [("q1", "point", SF[0], SF[1])], "query_id string, kind string, lat double, lng double")
    got = rq.search(spark, small_index, q, refine=False)
    keys = {r["key"] for r in got.collect()}
    # fixed-a/fixed-b are indexed on the SF leaf cell itself
    assert keys == {"single-id", "fixed-a", "fixed-b"}


def test_suite_b_polygon_interior_point(spark, small_index):
    """Query = leaf cell of (0.5, 0.5) -> polygon-id via ancestor-match."""
    q = _q(spark, [("q1", "point", 0.5, 0.5)], "query_id string, kind string, lat double, lng double")
    got = rq.search(spark, small_index, q, refine=False)
    keys = {r["key"] for r in got.collect()}
    assert keys == {"polygon-id"}


def test_suite_c_miss_south_pole(spark, small_index):
    q = _q(spark, [("q1", "point", -90.0, 0.0)], "query_id string, kind string, lat double, lng double")
    got = rq.search(spark, small_index, q, refine=False)
    assert got.count() == 0


def test_suite_e_fixed_cell_roundtrip(spark, small_index):
    """Query the fixed cell -> both fixed keys (go/roaringgeomap_test.go:34-45)."""
    fixed = int(np.uint64(9260949627242122337).view(np.int64))
    q = _q(spark, [("q1", "cell", fixed)], "query_id string, kind string, cell_id long")
    got = rq.search(spark, small_index, q, refine=False)
    keys = {r["key"] for r in got.collect()}
    assert {"fixed-a", "fixed-b"} <= keys
    assert "polygon-id" not in keys


def test_refine_drops_cell_false_positives(spark, small_index):
    """A cap query near but not containing SF: candidates may appear at
    cell level; refinement must drop the miss."""
    q = _q(
        spark,
        [("near", "cap", SF[0] + 0.05, SF[1], 1000.0), ("hit", "cap", SF[0], SF[1], 1000.0)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    got = rq.search(spark, small_index, q, refine=True)
    rows = {(r["query_id"], r["key"]) for r in got.collect()}
    assert ("hit", "single-id") in rows
    assert all(qid != "near" for qid, _ in rows)


def test_manifest_resume(spark, small_index):
    """Re-running the build with resume=True must skip all stages.

    verify_source=False is the documented no-scan escape hatch (the
    default now fingerprints the source, so a resume with a DIFFERENT df
    — here an empty one — would correctly rebuild): with it, committed
    stages are reused without the source ever being touched."""
    from rgm.checkpoint import Manifest

    man = Manifest(small_index)
    before = {s: e["committed_utc"] for s, e in man.doc["stages"].items()}
    assert set(before) == {"covers", "keys", "pairs", "postings"}
    # resume build with an EMPTY df: stages committed -> df never touched
    empty = spark.createDataFrame([], "key string, kind string, lat double, lng double")
    man2 = ridx.build_index(
        spark, empty, "key", small_index, bucket=3, max_cells=10,
        resume=True, verify_source=False,
    )
    after = {s: e["committed_utc"] for s, e in man2.doc["stages"].items()}
    assert before == after


def test_key_ids_dense_and_spatially_ordered(spark, small_index):
    keys = ridx.load_keys(spark, small_index).collect()
    ids = sorted(r["key_id"] for r in keys)
    assert ids == list(range(len(keys)))


def test_count_keys_matches_search(spark, small_index):
    q = _q(
        spark,
        [("q1", "cap", SF[0], SF[1], 5000.0), ("q2", "point", 0.5, 0.5, None)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    counted = {r["query_id"]: r["n_keys"] for r in rq.count_keys(spark, small_index, q).collect()}
    searched = (
        rq.search(spark, small_index, q, refine=False)
        .groupBy("query_id").agg(F.countDistinct("key_id").alias("n")).collect()
    )
    searched = {r["query_id"]: r["n"] for r in searched}
    assert counted == searched


def test_tile_assignment_points(spark, small_index):
    pts = spark.createDataFrame(
        [("a", 37.7749, -122.4194), ("b", 37.7750, -122.4195), ("c", 0.5, 0.5)],
        "key string, lat double, lng double",
    )
    tiled = rq.assign_tiles(pts, level=9)
    rows = {r["key"]: r["tile_id"] for r in tiled.collect()}
    want = cm.to_spark(
        cm.latlng_to_cell(np.array([37.7749, 37.7750, 0.5]), np.array([-122.4194, -122.4195, 0.5]), 9)
    )
    assert rows["a"] == want[0] and rows["b"] == want[1] and rows["c"] == want[2]
    assert rows["a"] == rows["b"] != rows["c"]


def test_tiles_for_regions_matches_point_tiles(spark, small_index):
    """Suite G: every point's tile must appear in its covering region's tile set."""
    q = spark.createDataFrame(
        [("r1", "cap", SF[0], SF[1], 3000.0)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    tiles = {r["tile_id"] for r in rq.tiles_for_regions(q, level=13).collect()}
    # sample points inside the cap -> their level-13 tiles must be covered
    rng = np.random.default_rng(5)
    lat = SF[0] + rng.uniform(-0.02, 0.02, 200)
    lng = SF[1] + rng.uniform(-0.025, 0.025, 200)
    from rgm import geo

    m = geo.haversine_m(lat, lng, SF[0], SF[1]) <= 3000.0
    want = cm.to_spark(cm.latlng_to_cell(lat[m], lng[m], 13))
    assert set(want.tolist()) <= tiles


def test_region_payload_intersects_contains(spark, tmp_path):
    """Cap-keyed index: refine_mode='intersects'/'contains' vs numpy oracle
    (the real Intersects the reference stubs at RoaringGeoMapReader.cpp:93-95)."""
    rng = np.random.default_rng(21)
    n = 300
    clat = rng.uniform(32.0, 42.0, n)
    clng = rng.uniform(-115.0, -95.0, n)
    cr = rng.uniform(500.0, 40_000.0, n)
    rows = [
        (f"c{i}", "cap", float(clat[i]), float(clng[i]), float(cr[i])) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "key string, kind string, lat double, lng double, radius_m double"
    )
    out = str(tmp_path / "capidx")
    from rgm import index as ridx

    ridx.build_index(spark, df, "key", out, bucket=1, n_buckets=4)

    qlat, qlng, qr = 37.0, -105.0, 120_000.0
    q = spark.createDataFrame(
        [("q", "cap", qlat, qlng, qr)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    from rgm import geo, query as rq

    d = geo.haversine_m(clat, clng, qlat, qlng)
    want_inter = {f"c{i}" for i in np.nonzero(d <= qr + cr)[0]}
    want_cont = {f"c{i}" for i in np.nonzero(d + cr <= qr)[0]}

    got_inter = {
        r["key"] for r in rq.search(spark, out, q, refine_mode="intersects").collect()
    }
    got_cont = {
        r["key"] for r in rq.search(spark, out, q, refine_mode="contains").collect()
    }
    assert got_inter == want_inter
    assert got_cont == want_cont
    assert want_cont < want_inter  # sanity: contains is strictly stronger


def test_hot_cell_skew_postings(spark, tmp_path_factory):
    """Skew soundness (SURVEY C7): thousands of keys on the SAME leaf cell,
    arriving from many input partitions. The two-phase postings encode
    (partial bitmap per scan split -> merge per cell) must union partials
    exactly: every rollup/origin posting's cardinality equals the number of
    distinct keys on that cell, and a query on the hot point returns all
    keys once each."""
    out = str(tmp_path_factory.mktemp("idx") / "hot")
    n = 3000
    pts = (
        spark.range(n)
        .repartition(8)  # spread the hot cell across many splits
        .select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.lit("point").alias("kind"),
            F.lit(SF[0]).alias("lat"),
            F.lit(SF[1]).alias("lng"),
        )
    )
    ridx.build_index(spark, pts, "key", out, bucket=3, n_buckets=4)
    postings = ridx.load_postings(spark, out)
    # every posting row for the hot lineage carries all n keys exactly once
    cards = [r["card"] for r in postings.select("card").collect()]
    assert cards and all(c == n for c in cards), cards
    q = spark.createDataFrame(
        [("q", "point", SF[0], SF[1])],
        "query_id string, kind string, lat double, lng double",
    )
    got = rq.search(spark, out, q, refine=True).select("key").collect()
    keys = sorted(r["key"] for r in got)
    assert keys == sorted(f"k{i}" for i in range(n))
    cnt = rq.count_keys(spark, out, q).collect()
    assert cnt[0]["n_keys"] == n


def test_binary_keys_roundtrip(spark, tmp_path):
    """Reference keys are arbitrary byte sequences (README.md:5-11,
    RoaringGeoMapWriter.h:44); the engine must index and return BinaryType
    keys unchanged — build, search, count, and kNN all typed from the key
    column."""
    rows = [
        (bytes([i, 255 - i, 0, 7]) + b"\x00payload", 30.0 + i * 0.5, -100.0 + i * 0.5)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        [(k, "point", la, ln) for k, la, ln in rows],
        "key binary, kind string, lat double, lng double",
    )
    out = str(tmp_path / "binidx")
    ridx.build_index(spark, df, "key", out, bucket=3, n_buckets=2)

    keys = ridx.load_keys(spark, out)
    assert dict(keys.dtypes)["key"] == "binary"
    got_keys = {bytes(r["key"]) for r in keys.collect()}
    assert got_keys == {k for k, _, _ in rows}

    qdf = spark.createDataFrame(
        [("qa", "cap", 31.0, -99.0, 200_000.0)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    hits = rq.search(spark, out, qdf, refine=True).collect()
    from rgm import geo

    want = {
        k for k, la, ln in rows if geo.haversine_m(la, ln, 31.0, -99.0) <= 200_000.0
    }
    assert {bytes(r["key"]) for r in hits} == want and len(want) > 0

    knn = rq.knn(
        spark,
        out,
        spark.createDataFrame([("k0", 31.0, -99.0)], "query_id string, lat double, lng double"),
        k=3,
        r0_m=50_000,
    ).collect()
    assert len(knn) == 3 and all(isinstance(bytes(r["key"]), bytes) for r in knn)
    # count_keys is the bitmap-union CANDIDATE count (refine=False level)
    cnt = rq.count_keys(spark, out, qdf).collect()
    n_cand = rq.search(spark, out, qdf, refine=False).select("key_id").distinct().count()
    assert cnt[0]["n_keys"] == n_cand >= len(want)


def test_region_payloads_rect_polygon_refinement(spark, tmp_path):
    """Region-vs-region refinement with rect and polygon PAYLOADS (not just
    caps/points): payload geometry round-trips through the index and both
    refine modes dispatch correctly. Expected sets are hand-computed."""
    payloads = spark.createDataFrame(
        [
            ("P1", "rect", None, None, None, 30.0, 31.0, -100.0, -99.0, None),
            ("P2", "polygon", None, None, None, None, None, None, None,
             [[40.0, -90.0], [41.0, -90.0], [40.5, -89.0]]),
            ("P3", "cap", 35.0, -95.0, 50_000.0, None, None, None, None, None),
            ("P4", "point", 20.0, -80.0, None, None, None, None, None, None),
        ],
        "key string, kind string, lat double, lng double, radius_m double, "
        "lat_lo double, lat_hi double, lng_lo double, lng_hi double, "
        "verts array<array<double>>",
    )
    out = str(tmp_path / "regidx")
    ridx.build_index(spark, payloads, "key", out, bucket=3, max_cells=64, n_buckets=2)

    queries = spark.createDataFrame(
        [
            # cap around P1's center, 200 km: contains the whole rect
            ("QC", "cap", 30.5, -99.5, 200_000.0, None, None, None, None, None),
            # rect superset of P1
            ("QR", "rect", None, None, None, 29.0, 32.0, -101.0, -98.0, None),
            # rect overlapping only P1's top half
            ("QR2", "rect", None, None, None, 30.5, 32.0, -101.0, -98.0, None),
            # polygon superset of triangle P2
            ("QP", "polygon", None, None, None, None, None, None, None,
             [[39.5, -91.0], [42.0, -91.0], [42.0, -88.0], [39.5, -88.0]]),
            # polygon overlapping P2 partially
            ("QP2", "polygon", None, None, None, None, None, None, None,
             [[40.25, -92.0], [40.25, -89.5], [41.5, -89.5], [41.5, -92.0]]),
            # tiny cap exactly on point P4
            ("QC4", "cap", 20.0, -80.0, 1_000.0, None, None, None, None, None),
        ],
        "query_id string, kind string, lat double, lng double, radius_m double, "
        "lat_lo double, lat_hi double, lng_lo double, lng_hi double, "
        "verts array<array<double>>",
    )

    inter = {
        (r["query_id"], r["key"])
        for r in rq.search(spark, out, queries, refine=True,
                           refine_mode="intersects").collect()
    }
    cont = {
        (r["query_id"], r["key"])
        for r in rq.search(spark, out, queries, refine=True,
                           refine_mode="contains").collect()
    }
    assert inter == {
        ("QC", "P1"), ("QR", "P1"), ("QR2", "P1"),
        ("QP", "P2"), ("QP2", "P2"), ("QC4", "P4"),
    }
    # P1 fits inside QC (farthest rect corner ~73 km < 200 km) and QR, but
    # only half-overlaps QR2; P2 fits in QP but not QP2; QC4 contains the
    # point payload exactly
    assert cont == {("QC", "P1"), ("QR", "P1"), ("QP", "P2"), ("QC4", "P4")}


def test_chunked_covers_resume(spark, tmp_path):
    """Intra-stage resume (north_rule per-partition lineage): the covers
    stage splits into independently-committed chunks; after a simulated kill
    (downstream stages gone, chunks intact) the resume skips every committed
    chunk (no covering recompute) and the final index is IDENTICAL —
    including key_id assignment — to an unchunked single-shot build."""
    import os
    import shutil

    rows = [(f"k{i}", "point", 25.0 + (i * 37 % 100) * 0.2, -120.0 + (i * 61 % 100) * 0.5)
            for i in range(400)]
    df = spark.createDataFrame(rows, "key string, kind string, lat double, lng double")

    single = str(tmp_path / "single")
    chunked = str(tmp_path / "chunked")
    ridx.build_index(spark, df, "key", single, bucket=3, n_buckets=2)
    ridx.build_index(spark, df, "key", chunked, bucket=3, n_buckets=2, covers_chunks=3)

    def keyset(path):
        return {
            (r["key"], r["key_id"])
            for r in ridx.load_keys(spark, path).select("key", "key_id").collect()
        }

    assert keyset(single) == keyset(chunked)  # chunking doesn't change ids

    # simulated kill after covers: downstream stages lost, chunks committed
    chunk_dirs = [os.path.join(chunked, f"covers.c{i:02d}") for i in range(3)]
    mtimes = {d: os.path.getmtime(d) for d in chunk_dirs}
    for stage in ("keys", "pairs", "postings"):
        shutil.rmtree(os.path.join(chunked, stage))
    ridx.build_index(spark, df, "key", chunked, bucket=3, n_buckets=2, covers_chunks=3)
    assert {d: os.path.getmtime(d) for d in chunk_dirs} == mtimes  # chunks untouched
    assert keyset(single) == keyset(chunked)

    # and a chunk loss rebuilds ONLY that chunk
    shutil.rmtree(chunk_dirs[1])
    for stage in ("keys", "pairs", "postings"):
        shutil.rmtree(os.path.join(chunked, stage))
    ridx.build_index(spark, df, "key", chunked, bucket=3, n_buckets=2, covers_chunks=3)
    assert os.path.getmtime(chunk_dirs[0]) == mtimes[chunk_dirs[0]]
    assert os.path.getmtime(chunk_dirs[2]) == mtimes[chunk_dirs[2]]
    assert keyset(single) == keyset(chunked)
