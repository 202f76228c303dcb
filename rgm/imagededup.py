"""Image near-duplicate detection over perceptual hashes.

Crosses the repo's two payload axes (geospatial-indexed image payloads x
training-data dedup): the images table (rgm.images, BASELINE.json
input_hint shape) carries a 64-bit average-hash ``phash``; near-duplicate
images are pairs within a small Hamming distance of each other. The same
banded pigeonhole join that powers ``rgm.dedup.simhash_pairs`` applies to
ANY precomputed 64-bit hash column — ``hash_neardup_pairs`` is that
generic operator, and ``image_neardup_pairs`` composes it with the real
decode -> phash kernel so the whole image path (bytes -> pixels -> hash ->
pairs) runs distributed.

Scale notes (100 TB): candidate generation is an equi-join on a
chunk-combination key — never an all-pairs join. The pigeonhole bound is
used at full strength: distance d touches at most d chunks, so at least
``chunks - d`` chunks match EXACTLY, and banding joins on combinations
of ``combo <= chunks - d`` chunks (the multi-index scheme of Manku,
Jain & Das Sarma, "Detecting Near-Duplicates for Web Crawling", WWW'07).
combo=2 (auto whenever the distance budget allows) widens the bucket key
from 8 to 16 bits: uniform-corpus buckets shrink from N/2^8 to N/2^16
and candidate volume by ~70x — single-chunk banding on the 375k-image
bench corpus generated ~2e9 candidate pairs (quadratic wall), two-chunk
~3e7. Banding stays EXACT, so the oracle brute-force-verifies at test
scale. The decode/phash stage is an Arrow-batched mapInPandas over the
binary column — per-image numpy work, no driver materialization.

Reference parity: the reference has no image pipeline (C++ spatial index
only); this extends the engine along the graft axes. Hamming banding
mirrors rgm/dedup.py:269-319 (simhash_pairs), kept oracle-green.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import images as rim


def hash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket_size: int | None = None,
    combo: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) whose 64-bit ``hash_col`` values differ in at
    most ``max_hamming`` bits, for ANY precomputed hash (phash, simhash,
    fingerprints).

    Multi-index pigeonhole banding: split 64 bits into ``chunks`` equal
    chunks; a pair at distance d differs in at most d chunks, so at least
    ``chunks - d`` chunks match exactly — the candidate equi-join keys on
    combinations of ``combo`` chunks and stays a SUPERSET of all true
    pairs whenever ``combo <= chunks - max_hamming`` (banding is EXACT;
    the popcount filter does the rest, all JVM-side expressions).

    ``combo`` defaults to 2 when the distance budget allows (else 1):
    a 2-chunk key has 2x the bits, so uniform-corpus buckets hold
    ~N/2^(2*chunk_bits) rows instead of ~N/2^chunk_bits — the difference
    between a quadratic candidate blowup and a linear pass on
    multi-million-row corpora. C(chunks, combo) keys per row bound the
    explode factor (28 for the 8C2 default).

    ``max_bucket_size`` is OPT-IN (default None = complete recall): a cap
    drops every pair inside an oversized bucket, which is only sound for
    degenerate exact-duplicate clusters (see rgm.pipeline.auto_bucket_cap
    for corpus-scaled sizing); any oracle must mirror it.
    """
    if 64 % chunks != 0:
        raise ValueError(f"chunks must divide 64, got {chunks}")
    if combo is None:
        combo = max(1, min(2, chunks - max_hamming))
    if not 1 <= combo <= chunks:
        raise ValueError(f"combo must be in [1, {chunks}], got {combo}")
    if not 0 <= max_hamming <= chunks - combo:
        raise ValueError(
            "pigeonhole requires max_hamming <= chunks - combo, got "
            f"max_hamming={max_hamming}, chunks={chunks}, combo={combo}"
        )
    chunk_bits = 64 // chunks
    mask = (1 << chunk_bits) - 1

    def _cv(c: int):
        return (
            F.shiftrightunsigned(F.col(hash_col), c * chunk_bits)
            .bitwiseAND(F.lit(mask))
        )

    # one packed 64-bit key per chunk combination: chunk values
    # concatenated bitwise (combo * chunk_bits <= 64 by construction)
    from itertools import combinations

    combo_cols = []
    for i, cs in enumerate(combinations(range(chunks), combo)):
        expr = _cv(cs[0])
        for c in cs[1:]:
            expr = F.shiftleft(expr, chunk_bits).bitwiseOR(_cv(c))
        combo_cols.append(F.struct(F.lit(i).alias("ci"), expr.alias("cv")))
    ch = df.select(
        id_col, hash_col, F.explode(F.array(*combo_cols)).alias("c")
    ).select(
        id_col, hash_col, F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    if max_bucket_size is not None:
        bsz = ch.groupBy("ci", "cv").agg(F.count("*").alias("bn"))
        ch = ch.join(
            bsz.filter(F.col("bn") <= max_bucket_size).select("ci", "cv"),
            on=["ci", "cv"],
            how="inner",
        )
    a = ch.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"), "ci", "cv")
    b = ch.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"), "ci", "cv")
    cand = (
        a.join(b, on=["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


_PHASH_SCHEMA = "image_id string, phash long"


def phash_from_bytes(df: DataFrame) -> DataFrame:
    """Recompute the 64-bit average-hash from the ENCODED image bytes:
    decode (real codec kernel, per fmt) -> luma block means -> hash. The
    ingest-time ``phash`` column is not trusted here — this is the
    re-derivation a dedup pass over crawled data runs. Arrow-batched
    mapInPandas; expects (image_id, bytes, w, h, fmt)."""

    def compute(it):
        for pdf in it:
            ids, hashes = [], []
            for r in pdf.itertuples():
                px = rim.decode_image(r.bytes, r.fmt, r.w, r.h)
                ids.append(r.image_id)
                hashes.append(rim.avg_phash(px))
            yield pd.DataFrame({"image_id": ids, "phash": hashes})

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        compute, _PHASH_SCHEMA
    )


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket_size: int | None = None,
    combo: int | None = None,
) -> DataFrame:
    """End-to-end image near-dup: decode bytes -> phash -> Hamming-banded
    pair join. Returns (id_a, id_b, hamming)."""
    hashed = phash_from_bytes(df)
    return hash_neardup_pairs(
        hashed, "image_id", "phash", max_hamming, chunks, max_bucket_size, combo
    )


# ---------------------------------------------------------------------------
# deterministic corpus with planted near-duplicates (tests + oracle fixture)
# ---------------------------------------------------------------------------


def variant_pixels(base_idx: int, w: int, h: int, seed: int = 42) -> np.ndarray:
    """A perturbed copy of base image ``base_idx``: deterministic noise on
    half the pixels, tuned so variant phashes land 0-8 bits from their
    base (mean ~3.4) — most pairs are caught at the default max_hamming=6,
    a few legitimately fall outside, so the test corpus exercises every
    band and the popcount filter. Shared by the Spark synthesis and the
    fixture generator (same precedent as the IVF centroid fixture:
    synthesis is shared deterministic code, the PAIRING semantics are
    verified independently by the oracle's brute-force join)."""
    px = rim.synth_pixels(base_idx, w, h, seed).astype(np.int16)
    rng = np.random.default_rng(seed * 2_000_003 + base_idx)
    sel = rng.random((h, w)) < 0.5
    noise = rng.integers(-45, 46, size=(h, w, 3))
    px[sel] += noise[sel]
    return np.clip(px, 0, 255).astype(np.uint8)


def variant_row(base_idx: int, seed: int = 42) -> tuple:
    """(image_id, bytes, w, h, fmt) for the variant of base ``base_idx`` —
    same deterministic size/format schedule as rgm.images.images_table."""
    w = (16, 32, 64)[base_idx % 3]
    h = (16, 32, 64)[(base_idx // 3) % 3]
    fmt = rim.FORMATS[base_idx % len(rim.FORMATS)]
    px = variant_pixels(base_idx, w, h, seed)
    return (f"var_{base_idx:012d}", rim.encode_image(px, fmt), w, h, fmt)


def images_with_variants(
    spark: SparkSession,
    n_base: int,
    variant_every: int = 4,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """The images table (rgm.images.images_table schema, subset of
    columns) plus a planted variant for every ``variant_every``-th base
    image — the deterministic near-duplicate corpus. Synthesized
    distributed (mapInPandas over an id range), no driver rows."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, n_base, 1, parts)

    def gen(it):
        for pdf in it:
            rows = []
            for idx in pdf["id"]:
                idx = int(idx)
                w = (16, 32, 64)[idx % 3]
                h = (16, 32, 64)[(idx // 3) % 3]
                fmt = rim.FORMATS[idx % len(rim.FORMATS)]
                px = rim.synth_pixels(idx, w, h, seed)
                rows.append((f"img_{idx:012d}", rim.encode_image(px, fmt), w, h, fmt))
                if idx % variant_every == 0:
                    rows.append(variant_row(idx, seed))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return base.mapInPandas(gen, "image_id string, bytes binary, w int, h int, fmt string")
