"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput_rows_per_sec": ...}

Workload shape mirrors the reference benchmark harness
(/root/reference/cpp/benchmarks/main.cpp): ~2,000 cap (1 km circle)
queries with max_cells=30 coverings against an indexed image-point corpus,
plus the fixed-level tile-assignment pass and the training-data operators.

Drift robustness (r4 verdict #4): a full bench run repeats the whole
measured pass SPARK_GRAFT_BENCH_REPS times (default 3; stage-filtered legs
default 1) in ONE process and reports per-query MINIMA across reps
alongside the rep-0 single-run numbers — the per-round JSON then carries
the attrib-style drift-robust table by construction, so cross-round
comparisons don't depend on which host window the snapshot landed in.

Scaling evidence (north_rule): run via tools/scaling.py (full-run pairs)
or tools/pairstage.py (stage-interleaved pairs) at two parallelism levels
on identical input; efficiency = (T_N / T_4N) / 4. Timed index builds
also emit per-build-stage seconds (build_stages, from the index manifest)
so scaling reports can attribute the build's N->4N gap to
covers/keys/pairs/postings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _count(df) -> int:
    return df.count()


def work_rows(n_points: int, n_regions: int, rows: dict) -> int:
    """The throughput numerator — ONE definition shared with
    tools/scaling.py so BENCH json and BASELINE.md agree."""
    return (
        n_points + n_regions
        + rows.get("tile_assign_s2", 0) + rows.get("contains_2000_caps", 0)
        + 3 * rows.get("images_synth", 0)  # synth + fidelity + features passes
    )


HEADLINE = [
    "index_build", "region_index_build_50k", "contains_2000_caps",
    "count_2000_caps", "region_contains_2000", "tile_assign_s2",
    "tile_counts_s2", "images_synth", "images_fidelity",
    "images_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # SPARK_GRAFT_STAGES=a,b: time ONLY those stages (tools/pairstage.py
    # runs one stage per subprocess so each stage's low/high legs share a
    # host window). State a requested stage needs (committed indexes, the
    # images parquet) is built untimed if missing; unset => full bench,
    # identical to the historical behavior.
    _stages = os.environ.get("SPARK_GRAFT_STAGES", "").strip()
    want: set[str] | None = set(filter(None, _stages.split(","))) or None
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1" if want else "3"))

    from rgm import benchqueries as bq
    from rgm import index as ridx
    from rgm import query as rq
    from rgm.session import get_spark

    spark = get_spark(app_name="rgm-bench", cpus=cpus)

    if want is not None:
        # Cold-process warmup (untimed): spawn the Python worker pool on
        # every task slot and load the kernel modules (numpy, rgm.covering,
        # rgm.images) before any timed stage. A full bench pays this once,
        # inside its FIRST UDF stage; a one-stage leg would otherwise pay
        # it inside the timed window at BOTH parallelism levels — a flat
        # adder that compresses the N-vs-4N ratio (measured: cold
        # region_index_build_50k read 0.336 efficiency vs ~0.6 warm).
        import rgm.images as rimg_w

        rimg_w.images_table(spark, 32 * cpus).count()
        wq = spark.range(8 * cpus).select(
            F.col("id").cast("string").alias("query_id"),
            F.lit("cap").alias("kind"),
            (F.lit(30.0) + (F.col("id") % 10).cast("double")).alias("lat"),
            F.lit(-100.0).alias("lng"),
            F.lit(1000.0).alias("radius_m"),
            F.lit(8).alias("max_cells"),
        )
        rq._cover_queries(wq, bucket=3, max_cells=8).count()
        # micro index build: warms the whole build path (covering UDF,
        # parquet writers, manifest, bitmap/roaring encode in postings)
        wpts = spark.range(64 * cpus).select(
            F.col("id").cast("string").alias("key"),
            F.lit("point").alias("kind"),
            (F.lit(30.0) + (F.col("id") % 97).cast("double") / 10.0).alias("lat"),
            (F.lit(-100.0) + (F.col("id") % 89).cast("double") / 10.0).alias("lng"),
        )
        wpath = os.path.join("/tmp", f"rgm_bench_warm_c{cpus}")
        shutil.rmtree(wpath, ignore_errors=True)
        ridx.build_index(spark, wpts, "key", wpath, bucket=3, n_buckets=4, resume=False)
        shutil.rmtree(wpath, ignore_errors=True)

    def wanted(*names: str) -> bool:
        return want is None or bool(want & set(names))

    def _build_stage_secs(path: str) -> dict[str, float]:
        from rgm.checkpoint import Manifest

        return {
            s: round(m.get("secs", 0.0), 3)
            for s, m in Manifest(path).metrics().items()
            if "secs" in m
        }

    # ---- one measured pass (repeatable: every timed stage rebuilds its
    # own state; untimed state builds go through build_index(resume=True),
    # whose corpus fingerprint + stored-params check rebuilds stale state
    # instead of silently serving an index built from a different scale
    # config — ADVICE r4 #2) ------------------------------------------------
    def one_pass():
        timings: dict[str, float] = {}
        rows: dict[str, int] = {}
        build_stages: dict[str, dict[str, float]] = {}

        def timed(name: str, fn):
            if not wanted(name):
                return None
            t0 = time.time()
            n = fn()
            timings[name] = round(time.time() - t0, 3)
            rows[name] = n
            return n

        # -- index build (fresh, not cached) ---------------------------------
        idx_path = os.path.join(
            "/tmp",
            "rgm_bench_idx_" + sf_dir.strip("/").replace("/", "_") + f"_c{cpus}",
        )
        pts = bq.points_df(spark, sf_dir).select(
            F.col("image_id").alias("key"), F.lit("point").alias("kind"), "lat", "lng"
        )
        # optional deterministic synthetic scale-up (identical at every
        # parallelism level — used by tools/scaling.py so the efficiency
        # measurement is dominated by parallel work, not fixed job overhead)
        extra = int(os.environ.get("SPARK_GRAFT_EXTRA_POINTS", "0"))
        if extra > 0:
            synth = spark.range(extra).select(
                F.concat(F.lit("x"), F.col("id")).alias("key"),
                F.lit("point").alias("kind"),
                (F.lit(24.396308) + (F.col("id") * 6151 % 1000000) / 1000000.0 * (49.384358 - 24.396308)).alias("lat"),
                (F.lit(-125.0) + (F.col("id") * 4231 % 1000000) / 1000000.0 * (-66.93457 - -125.0)).alias("lng"),
            )
            pts = pts.unionByName(synth)
        n_points = pts.count()

        def build(resume: bool = False):
            ridx.build_index(
                spark, pts, "key", idx_path, bucket=3,
                n_buckets=max(cpus, 8), resume=resume,
            )
            return n_points

        # stages whose legs read the big point index
        _IDX_DEPS = (
            "contains_2000_caps", "count_2000_caps", "knn_200",
            "contains_cap8", "contains_polygon", "knn",
            "contains_2000_polygons",
        )
        if wanted("index_build"):
            shutil.rmtree(idx_path, ignore_errors=True)
            timed("index_build", build)
            build_stages["index_build"] = _build_stage_secs(idx_path)
        elif wanted(*_IDX_DEPS):
            # untimed state build; resume=True fingerprint-validates any
            # committed state against the CURRENT corpus/scale config
            build(resume=True)
        from rgm.checkpoint import Manifest

        if Manifest(idx_path).is_committed("postings"):
            bq._INDEX_CACHE[sf_dir] = idx_path

        # -- reference write-bench shape: 50k indexed 1 km circles -----------
        # (/root/reference/cpp/benchmarks/main.cpp:145-146 indexes 50,000
        # circle covers; bucket=1 indexes raw cover cells with all-level
        # ancestors — no denormalize fanout for region covers)
        n_regions = int(os.environ.get("SPARK_GRAFT_BENCH_REGIONS", "50000"))
        region_idx = idx_path + "_regions"
        region_src = spark.range(n_regions).select(
            F.concat(F.lit("r"), F.col("id")).alias("key"),
            F.lit("cap").alias("kind"),
            (F.lit(24.396308) + (F.col("id") * 6151 % 1000000) / 1000000.0 * (49.384358 - 24.396308)).alias("lat"),
            (F.lit(-125.0) + (F.col("id") * 4231 % 1000000) / 1000000.0 * (-66.93457 - -125.0)).alias("lng"),
            F.lit(1000.0).alias("radius_m"),
            F.lit(30).alias("max_cells"),
        )

        def build_regions(resume: bool = False):
            ridx.build_index(
                spark, region_src, "key", region_idx, bucket=1,
                n_buckets=max(cpus, 8), resume=resume,
            )
            return n_regions

        if wanted("region_index_build_50k"):
            shutil.rmtree(region_idx, ignore_errors=True)
            timed("region_index_build_50k", build_regions)
            build_stages["region_index_build_50k"] = _build_stage_secs(region_idx)
        elif wanted("region_contains_2000"):
            build_regions(resume=True)

        # -- hot-cell skew build (SURVEY C7 evidence at bench scale): 30% of
        # the corpus lands in ONE ~50 km box (a single level-3 zone), the
        # worst realistic key-distribution skew; the two-phase postings build
        # (map-side partial bitmaps; hot cells span many scan splits) plus
        # AQE skew-join must keep the build within the uniform build's
        # per-row cost. Not in the headline (r1/r2 comparability) — reported
        # as its own entry.
        n_skew = int(os.environ.get("SPARK_GRAFT_BENCH_SKEW", "150000"))
        if n_skew and wanted("index_build_hotcell_30pct", "count_hotcell_cap"):
            skew_idx = idx_path + "_skew"
            n_hot = n_skew * 3 // 10
            hot = spark.range(n_hot).select(
                F.concat(F.lit("h"), F.col("id")).alias("key"),
                F.lit("point").alias("kind"),
                (F.lit(37.0) + (F.col("id") * 6151 % 1000000) / 1000000.0 * 0.45).alias("lat"),
                (F.lit(-106.0) + (F.col("id") * 4231 % 1000000) / 1000000.0 * 0.45).alias("lng"),
            )
            cold = spark.range(n_skew - n_hot).select(
                F.concat(F.lit("u"), F.col("id")).alias("key"),
                F.lit("point").alias("kind"),
                (F.lit(24.396308) + (F.col("id") * 7477 % 1000000) / 1000000.0 * (49.384358 - 24.396308)).alias("lat"),
                (F.lit(-125.0) + (F.col("id") * 5953 % 1000000) / 1000000.0 * (-66.93457 - -125.0)).alias("lng"),
            )
            skew_pts = hot.unionByName(cold)

            def build_skew(resume: bool = False):
                ridx.build_index(
                    spark, skew_pts, "key", skew_idx, bucket=3,
                    n_buckets=max(cpus, 8), resume=resume,
                )
                return n_skew

            if wanted("index_build_hotcell_30pct"):
                shutil.rmtree(skew_idx, ignore_errors=True)
                timed("index_build_hotcell_30pct", build_skew)
            else:
                build_skew(resume=True)
            # query straight into the hot zone: posting-list union on the
            # hottest cells (the skew-readers' worst case)
            hotq = spark.createDataFrame(
                [("hq", "cap", 37.22, -105.78, 30_000.0)],
                "query_id string, kind string, lat double, lng double, radius_m double",
            )
            timed(
                "count_hotcell_cap",
                lambda: _count(rq.count_keys(spark, skew_idx, hotq)),
            )

        # -- reference-shaped query batch: 2000 x 1 km caps ------------------
        # SPARK_GRAFT_BENCH_CAPS scales the batch for the query-floors proof
        # (tools/qfloors.py); stage names keep the canonical 2000 tag, and
        # qfloors logs to its own jsonl so scaled runs never pollute the
        # stage-pair minima. Queries only — no committed index state depends
        # on this knob, so resume reuse stays valid.
        n_caps = int(os.environ.get("SPARK_GRAFT_BENCH_CAPS", "2000"))
        caps = spark.range(n_caps).select(
            F.concat(F.lit("c"), F.col("id")).alias("query_id"),
            F.lit("cap").alias("kind"),
            (F.lit(24.396308) + (F.col("id") * 104729 % 100000) / 100000.0 * (49.384358 - 24.396308)).alias("lat"),
            (F.lit(-125.0) + (F.col("id") * 99991 % 100000) / 100000.0 * (-66.93457 - -125.0)).alias("lng"),
            F.lit(1000.0).alias("radius_m"),
            F.lit(30).alias("max_cells"),
        )
        timed("contains_2000_caps", lambda: _count(rq.search(spark, idx_path, caps, refine=True)))
        timed("count_2000_caps", lambda: _count(rq.count_keys(spark, idx_path, caps)))
        # cell-level Contains against the region index (the reference's exact
        # query semantics: circle covers vs circle covers)
        timed(
            "region_contains_2000",
            lambda: _count(rq.search(spark, region_idx, caps, refine=False)),
        )
        # same batch shape as generic quadrilaterals: exercises the batched
        # polygon covering (cover_polygons_batch — the per-row scalar BFS
        # was 71 ms/polygon, 2.4 min serial at this batch size) plus the
        # ray-casting refinement. Not in HEADLINE: added r5, and headline
        # membership must stay fixed for cross-round comparability.
        d = 0.009  # ~1 km half-side in degrees latitude
        polys = caps.select(
            "query_id",
            F.lit("polygon").alias("kind"),
            F.array(
                F.array(F.col("lat") - d, F.col("lng") - d),
                F.array(F.col("lat") - d, F.col("lng") + d),
                F.array(F.col("lat") + d, F.col("lng") + d),
                F.array(F.col("lat") + d, F.col("lng") - d),
            ).alias("verts"),
            F.lit(30).alias("max_cells"),
        )
        timed(
            "contains_2000_polygons",
            lambda: _count(rq.search(spark, idx_path, polys, refine=True)),
        )

        # -- image payload pipeline (the north_star table: synth -> fidelity
        # invariants -> features). Per-row work (codec + phash + resize) is
        # the compute profile a real 100 TB image corpus has — these stages
        # carry the representative CPU weight in the scaling measurement.
        import rgm.images as rimg

        n_img = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "30000"))
        # scale config in the dir name: a leg run at a different n_img can
        # never silently reuse another config's written table (ADVICE r4 #2)
        img_dir = idx_path + f"_images_{n_img}"

        def img_synth():
            rimg.images_table(spark, n_img).write.mode("overwrite").parquet(img_dir)
            return n_img

        if wanted("images_synth"):
            shutil.rmtree(img_dir, ignore_errors=True)
            timed("images_synth", img_synth)
        elif wanted("images_fidelity", "images_features") and not os.path.exists(
            os.path.join(img_dir, "_SUCCESS")
        ):
            img_synth()  # untimed state build
        # fidelity/features read the WRITTEN table (the product shape: decode
        # validation and feature extraction run over stored corpora). Until
        # r4 they consumed the lazy synth DF, which (a) re-ran the whole
        # synth UDF inside each stage and (b) bounced every image's bytes
        # through a Python->JVM->Python double Arrow hop (two adjacent
        # mapInPandas operators) — a flat, machine-bandwidth-bound cost that
        # dominated the stages' scaling (measured ~57s flat component at the
        # 600k-image scaling config; per-stage N->4N efficiency 0.52 vs 0.83
        # for the single-hop synth stage). A parquet scan is JVM-parallel
        # and one hop.
        if wanted("images_fidelity", "images_features"):
            imgs = spark.read.parquet(img_dir)

            def img_fid():
                fid = rimg.fidelity_check(imgs)
                bad = fid.filter(
                    (F.col("psnr") < 40.0) | ~F.col("phash_match") | ~F.col("caption_ok")
                ).count()
                assert bad == 0, f"{bad} fidelity violations"
                return n_img

            timed("images_fidelity", img_fid)
            timed("images_features", lambda: rimg.extract_features(imgs).count())

        # image near-dup at bench scale (the pyspark x image dedup axis):
        # decode -> phash -> pigeonhole Hamming banding over a
        # planted-variant corpus sized from the image workload. Not in the
        # headline (r1-r3 comparability); reported per-query like the other
        # extras.
        import rgm.imagededup as rid

        # corpus sized at n_img/8: the synthetic phash space is low-entropy
        # (~0.1% of pairs land within hamming 6), so the TRUE pair output
        # grows quadratically with corpus size — 375k images => 62M real
        # pairs. n/8 keeps the stage data-proportional (~4M pairs at the
        # scaling config) without letting pair materialization dominate the
        # whole bench wall.
        n_nd_base = max(n_img // 8, 1000)

        def img_neardup():
            corpus = rid.images_with_variants(spark, n_nd_base, variant_every=4)
            return rid.image_neardup_pairs(corpus, max_hamming=6).count()

        timed("images_neardup", img_neardup)

        # -- driver-contract spatial queries ----------------------------------
        timed("contains_cap8", lambda: _count(bq.q_spatial_contains_cap(spark, sf_dir)))
        timed("contains_polygon", lambda: _count(bq.q_spatial_contains_polygon(spark, sf_dir)))
        timed("knn", lambda: _count(bq.q_spatial_knn(spark, sf_dir)))

        # 200-point kNN batch: shows the per-round persist win (the r1 lazy
        # ring-expansion re-ran prior rounds' lineage, which compounds with
        # query count); not in the headline to keep r1 comparability
        def knn_200():
            qpts = spark.range(200).select(
                F.concat(F.lit("k"), F.col("id")).alias("query_id"),
                (F.lit(24.396308) + (F.col("id") * 86243 % 100000) / 100000.0 * (49.384358 - 24.396308)).alias("lat"),
                (F.lit(-125.0) + (F.col("id") * 75979 % 100000) / 100000.0 * (-66.93457 - -125.0)).alias("lng"),
            )
            import rgm.query as rq_

            return _count(rq_.knn(spark, idx_path, qpts, k=10, r0_m=20_000))

        timed("knn_200", knn_200)

        # -- tile assignment (the raster<->vector pass) ------------------------
        timed("tile_assign_s2", lambda: _count(bq.q_tile_assign_s2(spark, sf_dir)))
        timed("tile_counts_s2", lambda: _count(bq.q_tile_counts_s2(spark, sf_dir)))

        # -- training-data operators -------------------------------------------
        timed("dedup_minhash_lsh", lambda: _count(bq.q_dedup_minhash_lsh(spark, sf_dir)))
        timed("dedup_simhash", lambda: _count(bq.q_dedup_simhash(spark, sf_dir)))
        timed("ann_cosine_topk", lambda: _count(bq.q_ann_cosine_topk(spark, sf_dir)))
        timed("text_stats", lambda: _count(bq.q_text_stats(spark, sf_dir)))
        timed("text_tokens_bpe", lambda: _count(bq.q_text_tokens_bpe(spark, sf_dir)))

        return timings, rows, n_points, n_regions, build_stages

    per_rep: list[dict[str, float]] = []
    rows: dict[str, int] = {}
    build_stages_reps: list[dict[str, dict[str, float]]] = []
    n_points = n_regions = 0
    for _rep in range(max(reps, 1)):
        timings_r, rows, n_points, n_regions, bs = one_pass()
        per_rep.append(timings_r)
        build_stages_reps.append(bs)

    spark.stop()

    # per-query minima across reps — the drift-robust table (single runs on
    # this host swing ±50%; see BENCH/NOTES_r4.md)
    timings = {
        q: min(t[q] for t in per_rep if q in t)
        for q in {k for t in per_rep for k in t}
    }
    # headline = the data-proportional pipeline (index builds + the
    # reference-shaped 2000-cap query batch + the tile pass): the work that
    # grows with table size and therefore the work whose wall time is the
    # 100 TB signal. The small fixed-size driver-contract queries (8-cap /
    # 6-polygon / 4-point kNN / doc operators) are timed and reported but
    # carry irreducible per-job overhead that vanishes at scale.
    headline = HEADLINE

    def _headline_sum(t: dict[str, float]) -> float:
        return round(sum(t[q] for q in headline if q in t), 3)

    value = _headline_sum(timings)
    total = round(sum(timings.values()), 3)
    # throughput: rows ingested into the two indexes + tile assignments +
    # query batch results, per headline wall second (BASELINE.json metric)
    wrk = work_rows(n_points, n_regions, rows)
    out = {
        # the value is the sum of the data-proportional HEADLINE stages
        # (per-query minima across reps when reps > 1); the all-stages wall
        # is total_incl_extras_sec
        "metric": "headline_pipeline_wall_sec",
        "value": value,
        "unit": "sec",
        "headline": headline,
        "total_incl_extras_sec": total,
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "rows": rows,
        "n_points": n_points,
        "n_regions": n_regions,
        "reps": max(reps, 1),
        "throughput_rows_per_sec": round(wrk / value, 1) if value else None,
    }
    if max(reps, 1) > 1:
        out["value_rep0"] = _headline_sum(per_rep[0])
        out["queries_per_rep"] = per_rep
    # per-build-stage seconds (covers/keys/pairs/postings) for every TIMED
    # index build — minima across reps, same discipline as queries
    bs_all = [bs for bs in build_stages_reps if bs]
    if bs_all:
        merged: dict[str, dict[str, float]] = {}
        for bs in bs_all:
            for b, stages in bs.items():
                cur = merged.setdefault(b, {})
                for s, sec in stages.items():
                    cur[s] = min(cur.get(s, sec), sec)
        out["build_stages"] = merged
    print(json.dumps(out))


if __name__ == "__main__":
    main()
