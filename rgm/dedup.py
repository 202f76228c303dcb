"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side DataFrame expressions (explode / groupBy /
join) — no per-row Python. The LSH variants are the 100 TB scale path
(candidate generation is a bucket equi-join, never an all-pairs join); the
exact variants double as oracles at test scale.

Operators:
- exact_dedup            hash-groupBy exact duplicate collapse
- ngram_jaccard_pairs    exact character-n-gram Jaccard similarity join
- minhash_lsh_pairs      MinHash signatures + banded LSH candidate join
- simhash_pairs          64-bit SimHash + banded Hamming candidate join
- embedding_neardup_pairs  cosine near-duplicate pairs via random
                         hyperplane LSH buckets + exact verify
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the minimum id per exact text value. Map-side-combinable
    hash aggregate; scales as a single shuffle on the text hash."""
    return df.groupBy(text_col).agg(F.min(id_col).alias(id_col)).select(id_col, text_col)


def char_ngrams(df: DataFrame, id_col: str, text_col: str, n: int = 4) -> DataFrame:
    """Distinct character n-grams per document: (id, gram). Pure JVM:
    sequence + explode + substring."""
    return (
        df.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1))),
                    lambda i: F.col(text_col).substr(i, F.lit(n)),
                )
            ).alias("gram"),
        )
        .filter(F.length("gram") == n)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    threshold: float = 0.8,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (a < b) with
    |grams_a ∩ grams_b| / |grams_a ∪ grams_b| >= threshold.

    Scale note: the gram equi-join is the standard inverted-index set-join,
    quadratic in docs-per-gram — a stop-gram like ``" the"`` in 10^6 docs
    would yield 10^12 join rows. ``max_gram_docs`` bounds that fanout by
    dropping grams whose document frequency exceeds the cap BEFORE the
    self-join (one map-side-combinable count over grams). Dropped grams
    shrink n_inter only, so the filtered jaccard is a LOWER bound — results
    stay a subset of the exact pairs (no false positives); for near-1
    thresholds with hot-gram-heavy corpora pair the cap with the LSH path.
    None (default) = exact semantics.
    """
    grams = char_ngrams(df, id_col, text_col, n)
    # sizes use ALL grams (exact denominator) even when hot grams are
    # dropped from the join — keeps the lower-bound property
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    join_grams = grams
    if max_gram_docs is not None:
        df_counts = grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
        join_grams = grams.join(
            df_counts.filter(F.col("gram_df") <= max_gram_docs).select("gram"),
            on="gram",
            how="inner",
        )
    a = join_grams.select(F.col(id_col).alias("id_a"), "gram")
    b = join_grams.select(F.col(id_col).alias("id_b"), "gram")
    inter = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# 31-bit Mersenne prime: (a*h + b) with a,b,h < 2^31 stays within int64
# (Spark 4 runs ANSI mode; 61-bit moduli would overflow the multiply)
_MERSENNE = (1 << 31) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, _MERSENNE)), int(rng.integers(0, _MERSENNE)))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 4, num_perm: int = 64
) -> DataFrame:
    """One row per doc with the ``num_perm`` min-hashes PACKED into a single
    ``sig`` array<long> column (one column through every downstream shuffle,
    not 64 scalars — the r1 stage-2 join shipped 2x64 columns per side).

    Signature i = min over grams of (a_i * h(gram) + b_i) mod 2^31-1, where
    h is Spark's xxhash64 — a single groupBy with num_perm min() aggregates,
    fully JVM-side and map-side combinable."""
    grams = char_ngrams(df, id_col, text_col, n)
    h = F.pmod(F.xxhash64("gram"), F.lit(_MERSENNE))
    params = _minhash_params(num_perm)
    aggs = [
        F.min((h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return grams.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[F.col(f"mh_{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    verify: bool = True,
    est_margin: float = 0.15,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, three-stage:

    1. candidates: equi-join on (band, bucket) — bands tuned so the S-curve
       sits below the threshold (16 bands x 4 rows: j=0.8 pairs are missed
       with prob (1-0.8^4)^16 ≈ 2e-4; j=0.4 pairs collide ~34% but are
       discarded by stages 2-3). Never an all-pairs join. ``max_bucket_size``
       (OPT-IN, default None = complete recall) caps degenerate buckets
       (m identical docs -> m^2/2 candidate pairs): buckets larger than the
       cap are DROPPED before pair expansion, silently losing every pair in
       them — so any oracle must mirror the cap, and the cap must be sized
       so only exact-duplicate clusters exceed it (band buckets hash into
       2^64 space, so ordinary buckets stay tiny at any corpus size; see
       rgm.pipeline for production defaults that route such clusters through
       exact_dedup first).
    2. estimate filter: fraction of matching minhash components per
       candidate pair — zip_with over the two packed sig arrays (pure
       column math); keeps only est >= threshold - est_margin.
    3. (verify=True) exact n-gram Jaccard, computed pair-scoped: the gram
       join is keyed by (candidate pair, gram) so its size is
       |survivors| x grams/doc — never corpus-wide.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm).cache()
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                *[F.col("sig")[bi * rows + r] for r in range(rows)]
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    buckets = sigs.select(id_col, F.explode(F.array(*band_cols)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if max_bucket_size is not None:
        # one extra map-side-combinable count; drops only degenerate buckets
        bsz = buckets.groupBy("band", "bucket").agg(F.count("*").alias("bn"))
        buckets = buckets.join(
            bsz.filter(F.col("bn") <= max_bucket_size).select("band", "bucket"),
            on=["band", "bucket"],
            how="inner",
        )
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # stage 2: signature-similarity estimate over the packed arrays (one
    # array column per side through the join, not num_perm scalars)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est_expr = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(num_perm))
    cand = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est_expr)
        .filter(F.col("est_jaccard") >= threshold - est_margin)
        .select("id_a", "id_b", "est_jaccard")
    )
    if not verify:
        return cand

    # stage 3: exact Jaccard, pair-scoped
    grams = char_ngrams(df, id_col, text_col, n)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    pairs_only = cand.select("id_a", "id_b")
    ga = grams.select(F.col(id_col).alias("id_a"), "gram")
    gb = grams.select(F.col(id_col).alias("id_b"), "gram")
    # explode survivors by id_a's grams, then equi-join on (id_b, gram):
    # size = |survivors| x grams/doc, independent of corpus vocabulary skew
    exploded = F.broadcast(pairs_only).join(ga, "id_a")
    inter = exploded.join(gb, ["id_b", "gram"]).groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_inter")
    )
    sza = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    szb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sza, "id_a")
        .join(szb, "id_b")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens, fully JVM-side.

    Per bit: sign of sum over tokens of (+1 if token-hash bit set else -1).
    Returns (id, simhash long)."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    h = F.xxhash64("tok")
    one = F.lit(1).cast("long")
    aggs = [
        F.sum(
            F.when(h.bitwiseAND(F.shiftleft(one, i)) != 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for i in range(64):
        # shiftleft wraps at bit 63 (sign bit) — exactly the two's-complement
        # encoding we want for a 64-bit hash in a signed long
        sim = sim + F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
    return votes.select(id_col, sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs with SimHash Hamming distance <= max_hamming.

    Multi-index pigeonhole banding (Manku et al. WWW'07): any pair within
    distance d matches at least ``chunks - d`` chunks exactly -> candidate
    equi-join on 2-chunk combination keys (see
    rgm.imagededup.hash_neardup_pairs), then exact popcount filter.
    Banding is EXACT (no recall loss) with the default max_bucket_size=None.
    The OPT-IN cap drops buckets larger than it before the quadratic pair
    expansion — ONLY sound when sized so ordinary buckets never hit it:
    a chunk bucket holds ~N/2^chunk_bits docs on a random corpus (N/256
    here), so the cap must be >> that (see rgm.pipeline.auto_bucket_cap) or
    it silently deletes ordinary pairs; any oracle must mirror it."""
    # banding is the generic 64-bit operator (multi-index pigeonhole,
    # combo=2 by default here: chunks - max_hamming = 5 >= 2) — one
    # implementation, shared with image phash near-dup
    from .imagededup import hash_neardup_pairs

    sh = simhash(df, id_col, text_col)
    return hash_neardup_pairs(
        sh, id_col, "simhash",
        max_hamming=max_hamming, chunks=chunks, max_bucket_size=max_bucket_size,
    )


def hyperplanes(
    n_tables: int, bits_per_table: int, dim: int, seed: int = 11
) -> np.ndarray:
    """The deterministic random-hyperplane bank shared by the Spark LSH
    (embedding_neardup_pairs) and the DuckDB oracle mirror
    (rgm.benchqueries) — both embed the same doubles as literals."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits_per_table, dim))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_tables: int = 8,
    bits_per_table: int = 4,
    seed: int = 11,
    dim: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs via banded random-hyperplane LSH + exact
    cosine verify.

    ``n_tables`` independent hash tables of ``bits_per_table`` sign bits
    each: a pair at angle θ collides in one table with (1-θ/π)^bits, in any
    with 1-(1-p)^tables — tune bits/tables to the threshold. Candidates are
    the per-(table, bucket) equi-join; verification is exact cosine via
    zip_with/aggregate — all built-in expressions, no all-pairs join.

    ``max_bucket_size`` is OPT-IN (default None): there are only
    2^bits_per_table buckets per table (16 here), so an ORDINARY bucket
    holds ~N/16 vectors and any fixed cap is exceeded by every bucket once
    the corpus outgrows ~16x the cap — a cap here deletes ordinary pairs
    wholesale, not just degenerate clusters. Cap only with a corpus-scaled
    value (rgm.pipeline.auto_bucket_cap) and mirror it in any oracle.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(n_tables, bits_per_table, dim, seed)

    def dot_with_const(vec, const: np.ndarray):
        arr = F.array(*[F.lit(float(x)) for x in const])
        return F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )

    table_cols = []
    for t in range(n_tables):
        sig = F.lit(0).cast("long")
        for i in range(bits_per_table):
            sig = sig + F.when(
                dot_with_const(F.col(vec_col), planes[t, i]) > 0,
                F.lit(1 << i).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        table_cols.append(F.struct(F.lit(t).alias("tbl"), sig.alias("sig")))
    with_sig = df.select(
        id_col, vec_col, F.explode(F.array(*table_cols)).alias("tb")
    ).select(
        id_col, vec_col, F.col("tb.tbl").alias("tbl"), F.col("tb.sig").alias("sig")
    )
    if max_bucket_size is not None:
        bsz = with_sig.groupBy("tbl", "sig").agg(F.count("*").alias("bn"))
        with_sig = with_sig.join(
            bsz.filter(F.col("bn") <= max_bucket_size).select("tbl", "sig"),
            on=["tbl", "sig"],
            how="inner",
        )
    a = with_sig.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "tbl", "sig"
    )
    b = with_sig.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "tbl", "sig"
    )
    cand = (
        a.join(b, on=["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "v_a", "v_b")
        .distinct()
    )

    def dot(u, v):
        return F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    # norm floor (same 1e-12 as the numpy paths): zero-norm vectors score
    # cosine 0 instead of raising DIVIDE_BY_ZERO under ANSI mode; bit-exact
    # no-op for real vectors so the DuckDB oracle mirror is unaffected
    cos = dot(F.col("v_a"), F.col("v_b")) / (
        F.greatest(F.sqrt(dot(F.col("v_a"), F.col("v_a"))), F.lit(1e-12))
        * F.greatest(F.sqrt(dot(F.col("v_b"), F.col("v_b"))), F.lit(1e-12))
    )
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
