"""Round-5 regression tests: build_index resume fingerprint (stale-index
serve), non-cancelling corpus fingerprint, byte-bounded ivf_search
broadcast regime, int8-quantized IVF candidates with exact rerank, kNN on
a read-only index, writer lease (mutual exclusion + TTL steal) closing the
compaction-vs-append race, and the real WAV/Y4M codecs."""

import json
import os
import shutil
import threading
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

import rgm.images as rimg


# ---------------------------------------------------------------------------
# build_index resume fingerprint (r4 verdict Missing #2 / next-round #3)
# ---------------------------------------------------------------------------


def _pts(spark, n, shift=0.0):
    return spark.createDataFrame(
        [
            (f"p{i}", "point", 30.0 + (i * 37 % 100) / 10.0 + shift, -110.0 + (i * 53 % 100) / 10.0)
            for i in range(n)
        ],
        "key string, kind string, lat double, lng double",
    )


def test_build_index_resume_fingerprint(spark, tmp_path):
    """resume=True reuses a committed index only when the build params AND
    the source-corpus fingerprint match; a changed corpus or a changed
    bucket rebuilds instead of silently serving stale state (the exact
    class the bench's stage-filtered legs hit when a scale env changes
    between subprocesses — ADVICE r4 #2)."""
    from rgm import index as ridx
    from rgm import query as rq
    from rgm.checkpoint import manifest_doc

    out = str(tmp_path / "idx")
    df1 = _pts(spark, 60)
    ridx.build_index(spark, df1, "key", out, bucket=3, n_buckets=2)
    t1 = manifest_doc(out)["stages"]["covers"]["committed_utc"]

    # same corpus + params: resumes (covers not recommitted)
    ridx.build_index(spark, df1, "key", out, bucket=3, n_buckets=2, resume=True)
    assert manifest_doc(out)["stages"]["covers"]["committed_utc"] == t1

    # changed bucket: rebuild
    ridx.build_index(spark, df1, "key", out, bucket=1, n_buckets=2, resume=True)
    doc = manifest_doc(out)
    assert doc["stages"]["covers"]["committed_utc"] != t1
    assert doc["params"]["build"]["bucket"] == 1

    # changed corpus (same row count, shifted lats): rebuild — and queries
    # answer from the NEW data
    t2 = doc["stages"]["covers"]["committed_utc"]
    df2 = _pts(spark, 60, shift=30.0)  # lats 60..70 instead of 30..40
    ridx.build_index(spark, df2, "key", out, bucket=1, n_buckets=2, resume=True)
    assert manifest_doc(out)["stages"]["covers"]["committed_utc"] != t2
    qdf = spark.createDataFrame(
        [("q", "cap", 65.0, -105.0, 2_000_000.0)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    assert rq.search(spark, out, qdf, refine=True).count() > 0


def test_build_index_resume_fingerprint_partial(spark, tmp_path):
    """A killed build (some stages committed) resumes under the same corpus
    — the fingerprint check distinguishes 'same build, interrupted' from
    'different build, stale'."""
    from rgm import index as ridx
    from rgm.checkpoint import Manifest, manifest_doc

    out = str(tmp_path / "idx")
    df1 = _pts(spark, 40)
    ridx.build_index(spark, df1, "key", out, bucket=3, n_buckets=2)
    # simulate a kill after covers: drop the later stages from the manifest
    man = Manifest(out)
    t_cov = man.doc["stages"]["covers"]["committed_utc"]
    for s in ("keys", "pairs", "postings"):
        shutil.rmtree(man.stage_dir(s), ignore_errors=True)
        man.doc["stages"].pop(s, None)
    man._flush()
    ridx.build_index(spark, df1, "key", out, bucket=3, n_buckets=2, resume=True)
    doc = manifest_doc(out)
    assert doc["stages"]["covers"]["committed_utc"] == t_cov  # resumed
    assert doc["stages"]["postings"]["status"] == "committed"  # completed


def test_corpus_fingerprint_not_xor_cancellable(spark):
    """bit_xor cancels even-multiplicity rows ({A,A,C} and {B,B,C} share
    count AND xor); the decimal-sum second aggregate distinguishes them
    (ADVICE r4 #1)."""
    from rgm.similarity import corpus_stats

    a = spark.createDataFrame(
        [(1, [1.0]), (1, [1.0]), (3, [3.0])], "vec_id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(2, [2.0]), (2, [2.0]), (3, [3.0])], "vec_id long, embedding array<double>"
    )
    na, xa, sa = corpus_stats(a)
    nb, xb, sb = corpus_stats(b)
    assert (na, xa) == (nb, xb)  # the r4 detector is blind to this pair
    assert sa != sb  # the sum is not


def test_source_stats_order_insensitive(spark):
    """The build fingerprint is a pure multiset function of the rows."""
    from rgm.index import source_stats

    df = _pts(spark, 50)
    shuffled = df.orderBy(F.rand(7)).repartition(5)
    assert source_stats(df, "key") == source_stats(shuffled, "key")


# ---------------------------------------------------------------------------
# IVF: byte-bounded broadcast regime + quantized candidates (verdict #5/#6)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wide_emb(spark):
    rng = np.random.default_rng(11)
    dim = 64
    rows = [
        (i, (rng.standard_normal(dim) + (i % 5)).tolist()) for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def test_ivf_search_byte_bound_forces_distributed(spark, tmp_path, wide_emb):
    """A small query COUNT with wide vectors must still route to the
    distributed regime when the estimated collect bytes exceed the byte
    budget — and return exactly the broadcast regime's result."""
    from rgm import similarity as rsim

    out = str(tmp_path / "ivf")
    rsim.build_ivf_index(spark, wide_emb, out, n_cells=6, iters=2, sample_rows=300)
    queries = wide_emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    broad = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in rsim.ivf_search(spark, out, queries, k=4, nprobe=3).collect()
    }
    # 5 queries x nprobe 3 x (64*8+48) bytes ~ 8.4 kB > 1 kB budget
    forced = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in rsim.ivf_search(
            spark, out, queries, k=4, nprobe=3, batch_bytes=1024
        ).collect()
    }
    assert forced == broad and len(broad) == 20


def test_ivf_quantized_recall_and_rerank(spark, tmp_path, wide_emb):
    """quantize=True stores an int8 copy; the quantized candidate pass +
    exact rerank must reach AT LEAST the flat path's recall vs brute force
    at equal nprobe (r4 verdict #6 done-criterion), and its scores must be
    exact (from the float rerank, not the int8 approximation)."""
    from rgm import similarity as rsim

    out = str(tmp_path / "ivfq")
    rsim.build_ivf_index(
        spark, wide_emb, out, n_cells=6, iters=2, sample_rows=300, quantize=True
    )
    # the quantized column exists and the float column survives untouched
    vec = spark.read.parquet(os.path.join(out, "vectors"))
    assert "vec_q" in vec.columns
    row = vec.filter(F.col("vec_id") == 7).collect()[0]
    q = np.asarray(row["vec_q"], dtype=np.float64)
    v = np.asarray(row["embedding"], dtype=np.float64)
    assert np.max(np.abs(q)) == 127
    cos = q @ v / (np.linalg.norm(q) * np.linalg.norm(v))
    assert cos > 0.999  # int8 max-abs quantization preserves direction

    queries = wide_emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    brute = rsim.brute_topk(wide_emb, queries, k=5)
    truth = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    flat = {
        (r["query_id"], r["vec_id"])
        for r in rsim.ivf_search(spark, out, queries, k=5, nprobe=3).collect()
    }
    quant_rows = rsim.ivf_search(
        spark, out, queries, k=5, nprobe=3, quantized=True
    ).collect()
    quant = {(r["query_id"], r["vec_id"]) for r in quant_rows}
    assert len(quant & truth) >= len(flat & truth)
    # scores exact: every (query, id) pair's cosine matches the flat path
    flat_scores = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in rsim.ivf_search(spark, out, queries, k=5, nprobe=3).collect()
    }
    for r in quant_rows:
        key = (r["query_id"], r["vec_id"])
        if key in flat_scores:
            assert abs(r["cosine"] - flat_scores[key]) < 1e-12


def test_ann_ivf_topk_q_driver_query_matches_flat(spark):
    """The quantized-IVF driver query is registered under the oracle gate
    and, at the alpha=4 rerank margin, returns EXACTLY the flat driver
    query's (query_id, vec_id, rank) rows — engine-vs-engine, so this
    holds at any sf (the DuckDB fixture oracle additionally pins sf0.01,
    tools/checkoracle.py)."""
    from rgm import benchqueries as bq

    assert "ann_ivf_topk_q" in bq.QUERIES and "ann_ivf_topk_q" in bq.ORACLES
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("driver testdata absent")
    flat = {tuple(r) for r in bq.QUERIES["ann_ivf_topk"](spark, sf_dir).collect()}
    quant = {tuple(r) for r in bq.QUERIES["ann_ivf_topk_q"](spark, sf_dir).collect()}
    assert quant == flat and len(flat) > 0


def test_ivf_quantized_requires_quantized_index(spark, tmp_path, wide_emb):
    from rgm import similarity as rsim

    out = str(tmp_path / "ivfnq")
    rsim.build_ivf_index(spark, wide_emb, out, n_cells=4, iters=1, sample_rows=300)
    queries = wide_emb.limit(2).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    with pytest.raises(ValueError, match="quantize=True"):
        rsim.ivf_search(spark, out, queries, k=3, quantized=True)


# ---------------------------------------------------------------------------
# kNN on a read-only index (ADVICE r4 #4)
# ---------------------------------------------------------------------------


def test_knn_distributed_read_only_index(spark, tmp_path, monkeypatch):
    """A published (read-only) index stays queryable on the distributed
    path: scratch falls back to the out_path's filesystem (or a tempdir
    without out_path) instead of failing os.makedirs under the index.

    chmod can't simulate read-only for root (CAP_DAC_OVERRIDE), so the
    denial is injected: os.makedirs raises PermissionError for any path
    under the index root, exactly what a read-only mount produces."""
    from rgm import index as ridx
    from rgm import query as rq

    out = str(tmp_path / "roidx")
    ridx.build_index(spark, _pts(spark, 120), "key", out, bucket=3, n_buckets=2)
    qdf = spark.createDataFrame(
        [(f"q{i}", 31.0 + i, -109.0 + i) for i in range(4)],
        "query_id string, lat double, lng double",
    )
    want = {
        (r["query_id"], r["key"], r["rank"])
        for r in rq.knn(spark, out, qdf, k=3, r0_m=50_000).collect()
    }

    real_makedirs = os.makedirs

    def deny_under_index(path, *a, **kw):
        if os.path.abspath(path).startswith(os.path.abspath(out) + os.sep):
            raise PermissionError(13, "Read-only file system", path)
        return real_makedirs(path, *a, **kw)

    monkeypatch.setattr(os, "makedirs", deny_under_index)
    try:
        out_path = str(tmp_path / "knn_out")
        got = rq.knn(
            spark, out, qdf, k=3, r0_m=50_000, batch_threshold=2, out_path=out_path
        )
        assert {(r["query_id"], r["key"], r["rank"]) for r in got.collect()} == want
        assert not os.path.exists(os.path.join(out, "_scratch"))
        # the scratch lived (and was removed) beside the caller's out_path
        assert os.path.isdir(out_path)
        # no-out_path fallback: driver-local tempdir (local mode)
        got2 = rq.knn(spark, out, qdf, k=3, r0_m=50_000, batch_threshold=2)
        assert {(r["query_id"], r["key"], r["rank"]) for r in got2.collect()} == want
        assert not os.path.exists(os.path.join(out, "_scratch"))
    finally:
        monkeypatch.undo()
        rq.cleanup_knn_scratch()


# ---------------------------------------------------------------------------
# writer lease (verdict #7): primitive + real-interleaving compaction test
# ---------------------------------------------------------------------------


def test_writer_lease_mutual_exclusion(tmp_path):
    from rgm.checkpoint import WriterLease

    root = str(tmp_path)
    counter = {"v": 0, "max_inside": 0, "inside": 0}
    lock_err = []

    def worker():
        try:
            for _ in range(25):
                with WriterLease(root, ttl_s=10, timeout_s=30):
                    counter["inside"] += 1
                    counter["max_inside"] = max(counter["max_inside"], counter["inside"])
                    v = counter["v"]
                    time.sleep(0.001)
                    counter["v"] = v + 1
                    counter["inside"] -= 1
        except Exception as e:  # pragma: no cover
            lock_err.append(e)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not lock_err
    assert counter["max_inside"] == 1  # never two holders
    assert counter["v"] == 100  # no lost update
    assert [p for p in os.listdir(root) if p.startswith("_writer.lock")] == []


def test_writer_lease_ttl_steal_and_timeout(tmp_path):
    from rgm.checkpoint import WriterLease

    root = str(tmp_path)
    # a crashed holder: lock file with an expired TTL
    with open(os.path.join(root, "_writer.lock"), "w") as f:
        json.dump({"owner": "dead", "expires_utc": time.time() - 5}, f)
    with WriterLease(root, ttl_s=5, timeout_s=2) as l1:
        assert l1._held
        # a live holder: a second acquirer times out
        with pytest.raises(TimeoutError):
            WriterLease(root, ttl_s=5, timeout_s=0.2).acquire()


def test_build_index_bare_point_table(spark, tmp_path):
    """A bare (key, lat, lng) table — the mass product shape — indexes as
    points: null/absent kind used to fall into the region branch with
    all-null geometry and build a silently EMPTY index."""
    from rgm import index as ridx
    from rgm import query as rq

    out = str(tmp_path / "idx_bare")
    bare = spark.createDataFrame(
        [(f"p{i}", 37.77 + i * 0.001, -122.42 + i * 0.001) for i in range(40)],
        "key string, lat double, lng double",
    )
    ridx.build_index(spark, bare, "key", out, bucket=3, n_buckets=2)
    q = spark.createDataFrame(
        [("q1", "cap", 37.77, -122.42, 50_000.0)],
        "query_id string, kind string, lat double, lng double, radius_m double",
    )
    assert rq.search(spark, out, q, refine=True).count() == 40

    # no kind and no lat/lng: fail fast instead of building an empty index
    junk = spark.createDataFrame([("a", 1)], "key string, x int")
    with pytest.raises(ValueError, match="kind"):
        ridx.build_index(
            spark, junk, "key", str(tmp_path / "idx_junk"), bucket=3, n_buckets=2
        )


def test_writer_lease_concurrent_expired_steal(tmp_path):
    """N stealers racing one EXPIRED lock: the rename-steal grants at most
    one holder at a time (a bare unlink-steal lets stealer B delete the
    lock stealer A just created, double-granting — the exact interleave
    the rename closes)."""
    from rgm.checkpoint import WriterLease

    root = str(tmp_path)
    state = {"inside": 0, "max_inside": 0, "acquired": 0}
    errs = []
    gate = threading.Barrier(8)

    def stealer():
        try:
            gate.wait()  # maximize contention on the same expired lock
            with WriterLease(root, ttl_s=10, timeout_s=30):
                state["inside"] += 1
                state["max_inside"] = max(state["max_inside"], state["inside"])
                time.sleep(0.002)
                state["acquired"] += 1
                state["inside"] -= 1
        except Exception as e:  # pragma: no cover
            errs.append(e)

    for _round in range(10):
        with open(os.path.join(root, "_writer.lock"), "w") as f:
            json.dump({"owner": "dead", "expires_utc": time.time() - 5}, f)
        ts = [threading.Thread(target=stealer) for _ in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    assert not errs
    assert state["max_inside"] == 1
    assert state["acquired"] == 80
    # no stale-steal temp files left behind
    assert [p for p in os.listdir(root) if p.startswith("_writer.lock")] == []


def test_compaction_vs_live_appender_lease(spark, tmp_path):
    """The r4 residual race (a file appended between compaction's final
    re-list and the rename pair dies with the trashed dir) under REAL
    thread interleaving, hook removed: an appender thread writes
    micro-batch files under the writer lease while compact_pairs runs
    concurrently; every appended row must survive."""
    from rgm import index as ridx
    from rgm.checkpoint import WriterLease

    out = str(tmp_path / "idx")
    ridx.build_index(spark, _pts(spark, 80), "key", out, bucket=3, n_buckets=2)
    pairs_dir = os.path.join(out, "pairs")
    src = ridx._list_stage_files(out, "pairs")[0]
    src_copy = str(tmp_path / "batch.parquet")
    shutil.copy2(src, src_copy)
    rows_before = spark.read.parquet(pairs_dir).count()
    batch_rows = spark.read.parquet(src_copy).count()

    n_appends = 30
    stop = threading.Event()
    appended = {"n": 0}

    def appender():
        # mimics stream_index_append's leased micro-batch file append
        for i in range(n_appends):
            with WriterLease(out, ttl_s=10, timeout_s=30):
                # the dir may be mid-swap (absent for two renames) — the
                # lease guarantees it is never observed in that state
                assert os.path.isdir(pairs_dir), "append saw a mid-swap stage dir"
                shutil.copy2(src_copy, os.path.join(pairs_dir, f"late-{i:04d}.parquet"))
                appended["n"] += 1
            time.sleep(0.002)
        stop.set()

    t = threading.Thread(target=appender)
    t.start()
    n_compactions = 0
    try:
        while not stop.is_set():
            ridx.compact_pairs(spark, out, n_buckets=2)
            n_compactions += 1
    finally:
        t.join()
    # one final compaction after the appender finished folds in stragglers
    ridx.compact_pairs(spark, out, n_buckets=2)
    n_compactions += 1
    got = spark.read.parquet(pairs_dir).count()
    assert appended["n"] == n_appends
    assert got == rows_before + n_appends * batch_rows, (
        f"lost appended rows across {n_compactions} concurrent compactions"
    )


def test_operators_md_numeric_claims_resolve():
    """Every efficiency-like number OPERATORS.md quotes against a BENCH
    report must literally appear in that report (the r4 stale-0.826
    lesson, machine-audited)."""
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    import selfcheck

    assert selfcheck.audit_numeric_claims() == []


# ---------------------------------------------------------------------------
# WAV / Y4M codecs (verdict #8)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    pcm = rimg.synth_audio(3, n_frames=4000, sample_rate=8000)
    data = rimg.encode_wav(pcm, sample_rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    back, rate = rimg.decode_wav(data)
    assert rate == 8000 and back.shape == (4000, 1)
    assert np.array_equal(back[:, 0], pcm)
    # stereo + float input
    st = np.stack([np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1)
    back2, rate2 = rimg.decode_wav(rimg.encode_wav(st, 44100))
    assert rate2 == 44100 and back2.shape == (100, 2)
    assert np.max(np.abs(back2 / 32767.0 - st)) < 1e-4


def test_audio_features_wav_invariants(spark, tmp_path):
    """The image-PSNR-style gate for audio: decoded RMS and duration of a
    written WAV table match the analytic values of the synth signal."""
    import pandas as pd

    rows = []
    for i in range(8):
        pcm = rimg.synth_audio(i, n_frames=16000, sample_rate=16000)
        rows.append((f"a{i}", rimg.encode_wav(pcm, 16000), "wav"))
    rows.append(("bad", b"\x00\x01", "mp3"))
    pdf = pd.DataFrame(rows, columns=["key", "bytes", "fmt"])
    path = str(tmp_path / "audio")
    spark.createDataFrame(pdf).write.parquet(path)  # through a written table
    feats = {r["key"]: r for r in rimg.audio_features(spark.read.parquet(path)).collect()}
    # analytic RMS of 0.5 sin + 0.25 sin (incommensurate freqs) ~
    # sqrt(0.5^2/2 + 0.25^2/2) = 0.39528; integer frame counts keep it
    # within ~1e-3
    want_rms = np.sqrt(0.5**2 / 2 + 0.25**2 / 2)
    for i in range(8):
        r = feats[f"a{i}"]
        assert r["error"] is None and r["sample_rate"] == 16000
        assert abs(r["duration_s"] - 1.0) < 1e-9
        assert abs(r["rms"] - want_rms) < 2e-3
    assert feats["bad"]["rms"] is None and "not available" in feats["bad"]["error"]


def test_y4m_roundtrip_and_sampling():
    frames = rimg.synth_video(5, n_frames=12, w=32, h=16)
    data = rimg.encode_y4m(frames, fps=24)
    assert data.startswith(b"YUV4MPEG2 W32 H16 F24:1")
    back, fps = rimg.decode_y4m(data)
    assert fps == 24 and np.array_equal(back, frames)
    # frame sampling + the roll invariant (frame k == roll(frame 0, k))
    sampled = rimg.decode_video_frames(data, "y4m", every_n=4)
    assert sampled.shape[0] == 3
    assert np.array_equal(sampled[1], np.roll(frames[0], 4, axis=1))


def test_video_features_y4m(spark, tmp_path):
    import pandas as pd

    rows = []
    for i in range(4):
        frames = rimg.synth_video(i, n_frames=10, w=16, h=16)
        rows.append((f"v{i}", rimg.encode_y4m(frames, fps=5), "y4m", float(frames.mean())))
    pdf = pd.DataFrame(rows, columns=["key", "bytes", "fmt", "want_luma"])
    path = str(tmp_path / "video")
    spark.createDataFrame(pdf).write.parquet(path)
    feats = {r["key"]: r for r in rimg.video_features(spark.read.parquet(path)).collect()}
    for _, r in pdf.iterrows():
        got = feats[r["key"]]
        assert got["error"] is None
        assert got["n_frames"] == 10 and got["fps"] == 5
        assert abs(got["duration_s"] - 2.0) < 1e-9
        assert abs(got["mean_luma"] - r["want_luma"]) < 1e-9
    bad = rimg.video_features(
        spark.createDataFrame(
            pd.DataFrame({"key": ["x"], "bytes": [b"zz"], "fmt": ["h264"]})
        )
    ).collect()[0]
    assert bad["n_frames"] is None and "not available" in bad["error"]


def test_media_queries_match_analytic_stats(spark):
    """The two media driver queries (#30/#31): WAV and Y4M payloads decoded
    distributed; stats must equal the codec-independent analytic values /
    the raw-frame fixture."""
    import pandas as pd

    from rgm import benchqueries as bq

    sf = "/root/testdata/sf0.001"
    a = bq.q_media_audio_stats(spark, sf).toPandas()
    assert len(a) == bq.AUDIO_N
    for _, r in a.head(20).iterrows():
        n = 2000 + (int(r["doc_id"]) % 8) * 500
        assert r["n_samples"] == n and r["sample_rate"] == bq.AUDIO_RATE
        assert r["duration_s"] == n / bq.AUDIO_RATE

    v = bq.q_media_video_stats(spark, sf).toPandas().set_index("doc_id")
    fix = pd.read_parquet("/root/repo/fixtures/video_luma.parquet").set_index("vid")
    assert len(v) == bq.VIDEO_N
    for did in list(fix.index)[:20]:
        assert v.loc[did, "n_frames"] == fix.loc[did, "n_frames"]
        assert v.loc[did, "mean_luma"] == fix.loc[did, "mean_luma"]  # bit-exact


def test_package_zip_content_addressed_and_deterministic():
    """SparkContext.addFile rejects a path whose bytes changed since first
    registration, so the shipped rgm zip must be immutable per source state:
    same source -> same path + same bytes (rebuilt from scratch), no
    __pycache__/.pyc members (their bytes vary run-to-run), atomic publish
    (no torn reads for a concurrent session)."""
    import zipfile

    from rgm.session import package_zip

    p1 = package_zip()
    assert os.path.basename(p1).startswith("rgm_pkg_") and p1.endswith(".zip")
    b1 = open(p1, "rb").read()
    assert package_zip() == p1  # cached: same source, same artifact
    os.remove(p1)
    p2 = package_zip()  # rebuilt from scratch
    assert p2 == p1 and open(p2, "rb").read() == b1
    names = zipfile.ZipFile(p2).namelist()
    assert "rgm/__init__.py" in names and "rgm/session.py" in names
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)
    assert not any(
        f.startswith("rgm_pkg_") and f.endswith(".tmp")
        for f in os.listdir(os.path.dirname(p2))
    )


def test_distributed_query_planner_matches_driver(spark, monkeypatch):
    """BENCH/QUERY_FLOORS.md rep 0 falsified the 'query floors amortize'
    assumption: the all-driver covering kernel (~0.46 ms/cap) is a serial
    component proportional to batch size, pinning query-stage pair
    efficiency at ~0.29 at every batch scale. plan_query_cells now runs the
    kernel via mapInPandas above DRIVER_COVER_ROWS; the exploded frame and
    prune prefixes must be identical either way (same kernel, same cells)."""
    import pandas as pd

    from rgm import query as rq

    n = 64
    q = spark.range(n).selectExpr(
        "concat('q', id) as query_id",
        "case when id % 3 = 0 then 'cap' when id % 3 = 1 then 'rect' else 'polygon' end as kind",
        "cast(10 + id % 40 as double) as lat",
        "cast(-50 + id % 100 as double) as lng",
        "cast(1000 + 100 * (id % 7) as double) as radius_m",
        "cast(10 + id % 40 as double) as lat_lo",
        "cast(11 + id % 40 as double) as lat_hi",
        "cast(-50 + id % 100 as double) as lng_lo",
        "cast(-49 + id % 100 as double) as lng_hi",
        """case when id % 3 = 2 then array(array(
             cast(10 + id % 40 as double), cast(-50 + id % 100 as double),
             cast(10.8 + id % 40 as double), cast(-49.6 + id % 100 as double),
             cast(10.4 + id % 40 as double), cast(-50.8 + id % 100 as double)
           )) end as verts""",
        "cast(null as long) as cell_id",
        "cast(30 as int) as max_cells",
    )

    def plan(threshold):
        monkeypatch.setattr(rq, "DRIVER_COVER_ROWS", threshold)
        cells, prefixes = rq.plan_query_cells(spark, q, bucket=3, max_cells=30)
        pdf = (
            cells.toPandas()
            .sort_values(["query_id", "cell_id", "is_anc"])
            .reset_index(drop=True)
        )
        return pdf, prefixes

    drv, drv_pref = plan(threshold=n + 1)  # all-driver kernel
    dist, dist_pref = plan(threshold=1)  # mapInPandas kernel
    assert drv_pref == dist_pref and len(drv_pref) > 0
    assert len(drv) > 0
    pd.testing.assert_frame_equal(drv, dist)
