"""Round-3 regression tests: NaN-cosine top-k agreement, scale-safe dedup
cap defaults + pipeline wrappers, bloom NDV under chunked covers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    return df.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    ).cache()


def test_zero_norm_vector_topk_deterministic(spark):
    """A zero-norm vector must not crash (ANSI DIVIDE_BY_ZERO) nor rank
    nondeterministically between the partial and final top-k stages
    (ADVICE r2): the norm floor scores it cosine ~0, ranking it below every
    positively-correlated vector in both stages."""
    from rgm import similarity as rsim

    rows = [(i, [float(i + 1), 1.0, 0.0]) for i in range(8)]
    rows.append((99, [0.0, 0.0, 0.0]))  # zero-norm
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)
    queries = spark.createDataFrame(
        [("q0", [1.0, 0.0, 0.0])], "query_id string, q_embedding array<double>"
    )
    top3 = {r["vec_id"] for r in rsim.brute_topk(vecs, queries, k=3).collect()}
    assert 99 not in top3
    all9 = rsim.brute_topk(vecs, queries, k=9).collect()
    worst = max(all9, key=lambda r: r["rank"])
    assert worst["vec_id"] == 99 and len(all9) == 9


def test_dedup_bucket_caps_default_off(spark):
    """Default semantics are complete (no silent candidate drops): a corpus
    whose ordinary buckets exceed the old fixed cap of 1000 must still
    produce its near-dup pairs."""
    import inspect

    from rgm import dedup as rdd

    for fn in (rdd.minhash_lsh_pairs, rdd.simhash_pairs, rdd.embedding_neardup_pairs):
        assert inspect.signature(fn).parameters["max_bucket_size"].default is None


def test_pipeline_auto_cap_and_equivalence(spark, emb):
    """auto_bucket_cap scales with corpus/bucket count; at test scale the
    scaled cap sits above every bucket so the pipeline wrapper equals the
    exact (uncapped) operator."""
    from rgm import dedup as rdd
    from rgm import pipeline as rpl

    assert rpl.auto_bucket_cap(1_000_000, 16, mult=8.0) == 500_000
    assert rpl.auto_bucket_cap(100, 16) == 1024  # floor
    exact = {
        (r["id_a"], r["id_b"])
        for r in rdd.embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, dim=64
        ).collect()
    }
    piped = {
        (r["id_a"], r["id_b"])
        for r in rpl.embedding_dedup(
            emb, "vec_id", "embedding", threshold=0.45, dim=64
        ).collect()
    }
    assert piped == exact


def test_pipeline_minhash_subset_of_exact(spark):
    from rgm import pipeline as rpl

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    piped = rpl.minhash_dedup(docs, "doc_id", "text")
    rows = piped.collect()
    assert all(r["jaccard"] >= 0.8 for r in rows)


def test_bloom_ndv_sums_chunked_covers(tmp_path):
    """covers.cNN chunk stages must contribute to the bloom NDV estimate
    (the r2 bug sized blooms from rows=0 -> 1024 NDV on chunked builds)."""
    from rgm.checkpoint import Manifest
    from rgm.index import _bloom_opts

    man = Manifest(str(tmp_path / "idx"))
    man.doc["stages"] = {
        "covers.c00": {"metrics": {"rows": 300_000}},
        "covers.c01": {"metrics": {"rows": 250_000}},
        "keys": {"metrics": {"rows": 550_000}},
    }
    opts = _bloom_opts(man)
    assert opts["parquet.bloom.filter.expected.ndv#cell_id"] == str(2 * 550_000)
    # resume-time fallback: no covers metrics at all -> keys rows
    man.doc["stages"] = {"keys": {"metrics": {"rows": 10_000}}}
    assert _bloom_opts(man)["parquet.bloom.filter.expected.ndv#cell_id"] == str(20_000)


def test_manifest_doc_cache_invalidates_on_commit(tmp_path, spark):
    import os
    import time

    from rgm.checkpoint import Manifest, manifest_doc

    root = str(tmp_path / "m")
    man = Manifest(root)
    man.set_params(bucket=3)
    assert manifest_doc(root)["params"]["bucket"] == 3
    time.sleep(0.01)
    man.set_params(bucket=5)
    # ensure mtime moved (coarse filesystems)
    os.utime(man.path)
    assert manifest_doc(root)["params"]["bucket"] == 5
