"""Generate golden oracle fixtures under fixtures/ (committed to git).

The driver's correctness gate can only check queries whose semantics DuckDB
can express. Three operator families need engine-defined values DuckDB
cannot compute (S2 cell ids; xxhash64-based sketches), so we freeze golden
values to parquet and the oracle SQL joins against them:

- tile_assign_l9.parquet  (o_orderkey, tile_id): level-9 S2 tile of each
  order-derived point, for ALL sf dirs. Computed with rgm.cellmath — the
  numpy kernel golden-tested against the reference's 35 S2 tokens
  (/root/reference/cpp/test/RoaringGeoMapWriterTest.cpp:219-227) — NOT by
  running the Spark query, so the oracle checks the whole Spark path
  (expression lat/lng -> Arrow UDF -> explode) against the validated kernel.
- region_tiles_l9.parquet (query_id, tile_id): level-9 tile set per bench
  cap region. Same numpy code path as the UDF, run driver-side — but the
  fixture is no longer taken on faith: validate_region_tiles() proves a
  geometric SANDWICH with code paths independent of the covering BFS
  (plain haversine + cell corner coordinates):
    lower bound  every order point inside the cap has its level-9 tile
                 (from tile_assign_l9, the token-validated point kernel)
                 in the region's tile set — no missing tiles;
    upper bound  every tile in the set passes the necessary intersection
                 condition angle(cap_center, tile_center) <= cap_angle +
                 tile circumradius — no far-away tiles.
  The validation runs at fixture generation AND as a pytest
  (test_region_tiles_fixture_sandwich), so the oracle rows are
  geometrically certified, not merely algorithm-frozen.
- text_hashes.parquet (text_md5, simhash, fingerprint): 64-bit SimHash and
  winnowing fingerprint per distinct document text, recomputed from scratch
  with the pure-numpy XXH64 in rgm.xxh (itself golden-tested against
  Spark's xxhash64) — an execution-independent recomputation of both
  sketches. Keyed by md5(text) (DuckDB has md5) so one fixture serves every
  sf dir.
- ivf_centroids.parquet (ci, c double[]): the trained IVF coarse-quantizer
  centroids for the sf0.01 embeddings (the sf the driver gate runs at),
  produced by the same deterministic numpy k-means the engine's
  build_ivf_index runs on its driver-side sample (rgm.similarity.
  train_centroids — shared training code, disclosed). The oracle SQL takes
  these centroids as GIVEN constants and independently re-executes
  assignment, probing and ranking in DuckDB — the same mirroring discipline
  as the hyperplane LSH bank (_emb_lsh_oracle_sql).

- image_phash.parquet (image_id, phash): perceptual hashes of the
  deterministic planted-variant image corpus, recomputed through the same
  encode/decode round trip the Spark kernel runs (see image_phash_fixture
  docstring for the disclosure); the oracle brute-forces ALL pairs with
  popcount in DuckDB, independently checking the banded candidate join.

Regenerate with `python tools/make_fixtures.py` if /root/testdata changes.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
FIXDIR = os.path.join(ROOT, "fixtures")

_WS = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only (Spark split)


def tile_assign_fixture() -> pd.DataFrame:
    import pyarrow.parquet as pq

    from rgm import cellmath as cm
    from rgm.benchqueries import TILE_LEVEL

    keys = []
    for d in SF_DIRS:
        t = pq.read_table(os.path.join(d, "orders.parquet"), columns=["o_orderkey"])
        keys.append(t.column("o_orderkey").to_numpy())
    ok = np.unique(np.concatenate(keys)).astype(np.int64)
    # EXACTLY the double math of benchqueries._LAT_EXPR/_LNG_EXPR
    u = (ok * 9973) % 100000
    v = (ok * 7919) % 100000
    lat = 24.396308 + (u / 100000.0) * (49.384358 - 24.396308)
    lng = -125.0 + (v / 100000.0) * (-66.93457 - -125.0)
    tiles = cm.to_spark(cm.latlng_to_cell(lat, lng, TILE_LEVEL))
    return pd.DataFrame({"o_orderkey": ok, "tile_id": tiles})


def region_tiles_fixture() -> pd.DataFrame:
    from rgm import cellmath as cm
    from rgm.benchqueries import CAPS, TILE_LEVEL
    from rgm.udfs import _region_covers

    max_tiles = 4096  # tiles_for_regions default
    n = len(CAPS)
    covers = _region_covers(
        pd.Series(["cap"] * n),
        pd.Series([c[1] for c in CAPS]), pd.Series([c[2] for c in CAPS]),
        pd.Series([c[3] for c in CAPS]),
        pd.Series([np.nan] * n), pd.Series([np.nan] * n),
        pd.Series([np.nan] * n), pd.Series([np.nan] * n),
        pd.Series([None] * n), pd.Series([np.nan] * n),
        pd.Series(np.full(n, max_tiles)),
    )
    qids, tids = [], []
    level = TILE_LEVEL
    for (qid, *_), c in zip(CAPS, covers):
        lv = cm.level(c)
        fine = c[lv >= level]
        parts = (
            [np.unique(cm.parent(fine, np.full(len(fine), level)))] if len(fine) else []
        )
        cur = c[lv < level]
        while len(cur):
            lvc = cm.level(cur)
            at = cur[lvc == level]
            if len(at):
                parts.append(at)
            below = cur[lvc < level]
            cur = cm.children(below).reshape(-1) if len(below) else np.empty(0, np.uint64)
        tiles = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        sp = cm.to_spark(tiles)
        qids.extend([qid] * len(sp))
        tids.extend(sp.tolist())
    return pd.DataFrame({"query_id": qids, "tile_id": np.asarray(tids, dtype=np.int64)})


def validate_region_tiles(rt: pd.DataFrame, ta: pd.DataFrame) -> None:
    """Geometric sandwich certification of the region-tiles fixture using
    ONLY code paths independent of the covering BFS: plain haversine
    (rgm.geo) for point membership and S2 corner coordinates
    (cellmath.cell_corners_xyz / cell_to_center_xyz) for tile extents.
    Raises AssertionError on any violation."""
    from rgm import cellmath as cm
    from rgm import geo
    from rgm.benchqueries import CAPS

    by_q = {q: set(g["tile_id"]) for q, g in rt.groupby("query_id")}

    # point lat/lng re-derived with the shared literal arithmetic
    ok = ta["o_orderkey"].to_numpy()
    lat = 24.396308 + (((ok * 9973) % 100000) / 100000.0) * (49.384358 - 24.396308)
    lng = -125.0 + (((ok * 7919) % 100000) / 100000.0) * (-66.93457 - -125.0)
    ptile = ta["tile_id"].to_numpy()

    for qid, clat, clng, rad in CAPS:
        tiles = by_q.get(qid, set())
        # LOWER bound: tiles of contained points must all be present
        inside = geo.haversine_m(lat, lng, clat, clng) <= rad
        missing = set(ptile[inside].tolist()) - tiles
        assert not missing, f"{qid}: {len(missing)} contained-point tiles missing"
        # UPPER bound: every tile must satisfy the necessary intersection
        # condition vs the cap (center angle <= cap angle + circumradius)
        tarr = cm.from_spark(np.asarray(sorted(tiles), dtype=np.int64))
        centers = cm.cell_to_center_xyz(tarr)
        corners = cm.cell_corners_xyz(tarr)  # (n, 4, 3)
        circum = geo.angle_between(centers[:, None, :], corners).max(axis=1)
        cap_xyz = cm.latlng_to_xyz(np.array([clat]), np.array([clng]))[0]
        d = geo.angle_between(centers, cap_xyz[None, :])
        cap_ang = rad / geo.EARTH_RADIUS_M
        bad = d > cap_ang + circum + 1e-12
        assert not bad.any(), f"{qid}: {int(bad.sum())} tiles beyond the cap reach"


def simhash_py(text: str) -> int | None:
    from rgm.xxh import xxh64_str

    toks = [t for t in _WS.split(text) if t]
    if not toks:
        return None
    h = xxh64_str(toks).view(np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sim = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        sim |= np.uint64(1) << np.uint64(i)
    return int(sim.astype(np.uint64).view(np.int64) if hasattr(sim, "view") else sim)


def text_hashes_fixture() -> pd.DataFrame:
    import pyarrow.parquet as pq

    from rgm.xxh import xxh64_same_len, xxh64_str

    texts: list[str] = []
    seen = set()
    for d in SF_DIRS:
        t = pq.read_table(os.path.join(d, "documents.parquet"), columns=["text"])
        for s in t.column("text").to_pylist():
            if s is not None and s not in seen:
                seen.add(s)
                texts.append(s)

    window = 16  # rgm.text.fingerprint default
    # fingerprint: batch every full-length window-gram of every doc into one
    # matrix, hash once, min-reduce per doc
    doc_of, grams = [], []
    short_fp: dict[int, int] = {}
    for di, s in enumerate(texts):
        b = s.encode("utf-8")
        if len(b) >= window:
            for i in range(len(b) - window + 1):
                grams.append(b[i : i + window])
                doc_of.append(di)
        else:
            short_fp[di] = int(xxh64_str([s])[0])
    fp = np.full(len(texts), np.iinfo(np.int64).max, dtype=np.int64)
    if grams:
        mat = np.frombuffer(b"".join(grams), dtype=np.uint8).reshape(len(grams), window)
        h = xxh64_same_len(mat).view(np.int64)
        doc_of_a = np.asarray(doc_of, dtype=np.int64)
        order = np.argsort(doc_of_a, kind="stable")
        h, doc_of_a = h[order], doc_of_a[order]
        starts = np.concatenate([[0], np.nonzero(doc_of_a[1:] != doc_of_a[:-1])[0] + 1])
        mins = np.minimum.reduceat(h, starts)
        fp[doc_of_a[starts]] = mins
    for di, v in short_fp.items():
        fp[di] = v

    rows = []
    for di, s in enumerate(texts):
        rows.append(
            {
                "text_md5": hashlib.md5(s.encode("utf-8")).hexdigest(),
                "simhash": simhash_py(s),
                "fingerprint": int(fp[di]),
            }
        )
    df = pd.DataFrame(rows)
    df["simhash"] = df["simhash"].astype("Int64")
    df["fingerprint"] = df["fingerprint"].astype("int64")
    return df


def ivf_centroids_fixture() -> pd.DataFrame:
    import pyarrow.parquet as pq

    from rgm.benchqueries import IVF_ITERS, IVF_N_CELLS, IVF_SAMPLE
    from rgm.similarity import train_centroids

    # the driver gate runs at sf0.01 — train on exactly the sample
    # build_ivf_index collects there (rgm.similarity.hash_sample): rows
    # whose xxhash64(vec_id) % m == 0 (m = n // IVF_SAMPLE; m == 1 at this
    # corpus size, so every row), id-sorted, float32 widened to float64
    # (exact). The hash is the pure-numpy XXH64 mirror of Spark's
    # xxhash64-on-BIGINT (rgm.xxh.xxh64_int64, golden-tested), so the
    # fixture stays execution-independent of the Spark runtime.
    t = pq.read_table(
        os.path.join("/root/testdata/sf0.01", "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).to_pandas()
    m = max(1, len(t) // IVF_SAMPLE)
    if m > 1:
        from rgm.xxh import xxh64_int64

        # numpy int64 % positive m matches Spark's pmod (non-negative)
        t = t[xxh64_int64(t["vec_id"].to_numpy()) % m == 0]
    t = t.sort_values("vec_id", kind="mergesort").head(IVF_SAMPLE)
    sample = np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    cents = train_centroids(sample, IVF_N_CELLS, IVF_ITERS)
    return pd.DataFrame(
        {"ci": np.arange(IVF_N_CELLS, dtype=np.int64), "c": [c.tolist() for c in cents]}
    )


def image_phash_fixture() -> pd.DataFrame:
    """(image_id, phash) for the deterministic planted-variant image
    corpus the dedup_image_phash driver query synthesizes (rgm.imagededup.
    images_with_variants). Hashes are recomputed here through the same
    encode -> decode -> avg_phash round trip the Spark query's
    phash_from_bytes kernel runs (shared deterministic codec code,
    disclosed — the IVF-centroid precedent); the PAIRING semantics are
    what the oracle then verifies independently, by brute-force popcount
    over all pairs in DuckDB vs the engine's banded candidate join."""
    from rgm import imagededup as rid
    from rgm import images as rim
    from rgm.benchqueries import IMG_DEDUP_EVERY, IMG_DEDUP_N

    ids, hashes = [], []

    def add(image_id: str, px: np.ndarray, fmt: str) -> None:
        w, h = px.shape[1], px.shape[0]
        dec = rim.decode_image(rim.encode_image(px, fmt), fmt, w, h)
        ids.append(image_id)
        hashes.append(rim.avg_phash(dec))

    for idx in range(IMG_DEDUP_N):
        w = (16, 32, 64)[idx % 3]
        h = (16, 32, 64)[(idx // 3) % 3]
        fmt = rim.FORMATS[idx % len(rim.FORMATS)]
        add(f"img_{idx:012d}", rim.synth_pixels(idx, w, h), fmt)
        if idx % IMG_DEDUP_EVERY == 0:
            add(f"var_{idx:012d}", rid.variant_pixels(idx, w, h), fmt)
    return pd.DataFrame({"image_id": ids, "phash": np.asarray(hashes, dtype=np.int64)})


def video_luma_fixture() -> pd.DataFrame:
    """(vid, n_frames, fps, mean_luma) for the media_video_stats driver
    query: mean_luma is computed here DIRECTLY from the synthesized frames
    (numpy, no container round trip), while the Spark query gets it by
    decoding real Y4M bytes after a distributed encode -> table -> decode
    pipe. The Y4M container is lossless, so hash-equality of the double
    means proves frame-exact codec fidelity (the image_phash precedent)."""
    from rgm import images as rim
    from rgm.benchqueries import VIDEO_FPS, VIDEO_N, VIDEO_WH

    rows = []
    for vid in range(VIDEO_N):
        n_frames = 6 + vid % 10
        frames = rim.synth_video(vid, n_frames, VIDEO_WH, VIDEO_WH)
        rows.append((vid, n_frames, VIDEO_FPS, frames.astype(np.float64).mean()))
    return pd.DataFrame(
        rows, columns=["vid", "n_frames", "fps", "mean_luma"]
    ).astype({"vid": "int64", "n_frames": "int32", "fps": "int32"})


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    ta = tile_assign_fixture()
    ta.to_parquet(os.path.join(FIXDIR, "tile_assign_l9.parquet"), index=False)
    print(f"tile_assign_l9: {len(ta)} rows")
    rt = region_tiles_fixture()
    validate_region_tiles(rt, ta)
    rt.to_parquet(os.path.join(FIXDIR, "region_tiles_l9.parquet"), index=False)
    print(f"region_tiles_l9: {len(rt)} rows (sandwich-validated)")
    th = text_hashes_fixture()
    th.to_parquet(os.path.join(FIXDIR, "text_hashes.parquet"), index=False)
    print(f"text_hashes: {len(th)} rows")
    iv = ivf_centroids_fixture()
    iv.to_parquet(os.path.join(FIXDIR, "ivf_centroids.parquet"), index=False)
    print(f"ivf_centroids: {len(iv)} rows")
    ip = image_phash_fixture()
    ip.to_parquet(os.path.join(FIXDIR, "image_phash.parquet"), index=False)
    print(f"image_phash: {len(ip)} rows")
    vl = video_luma_fixture()
    vl.to_parquet(os.path.join(FIXDIR, "video_luma.parquet"), index=False)
    print(f"video_luma: {len(vl)} rows")


if __name__ == "__main__":
    main()
