"""Production-facing dedup entry points with scale-safe defaults.

The operators in :mod:`rgm.dedup` default to COMPLETE semantics (no
candidate caps) so they can be oracle-verified exactly. A 100 TB pipeline
caller wants the opposite default: bounded worst-case cost even on
pathological corpora (stop-grams, exact-duplicate clusters). These wrappers
encode that posture:

- hot n-grams are capped by document frequency (``ngram_jaccard_dedup``),
  keeping the inverted-index self-join linear in corpus size; results are a
  proven LOWER BOUND of the exact pairs (rgm.dedup.ngram_jaccard_pairs
  docstring, tested by test_ngram_max_gram_docs_is_lower_bound);
- exact-duplicate clusters are collapsed FIRST (one hash groupBy), so the
  LSH stages never see the m^2/2 pair blowup of m identical documents and
  bucket caps only have to guard genuinely adversarial buckets;
- bucket caps scale with corpus size and bucket count
  (:func:`auto_bucket_cap`) instead of a fixed constant — a fixed cap is
  wrong for coarse bucket spaces (16 buckets/table in the hyperplane LSH:
  ordinary buckets hold ~N/16 vectors, so any constant cap starts deleting
  ordinary pairs once N > 16x the cap).

Each wrapper documents what it may drop relative to the exact operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as dd


def auto_bucket_cap(n_rows: int, n_buckets: int, mult: float = 8.0, floor: int = 1024) -> int:
    """Bucket-size cap that only trips on degenerate buckets.

    Expected bucket size on a non-adversarial corpus is ``n_rows /
    n_buckets``; a bucket ``mult`` times that is (with overwhelming
    probability for hash buckets) an identical-signature cluster, which the
    caller should have collapsed via exact dedup. ``floor`` keeps small
    corpora uncapped entirely.
    """
    return max(floor, int(mult * n_rows / max(n_buckets, 1)))


def _distinct_texts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Collapse exact duplicates to their min-id representative — the
    pre-pass that makes LSH bucket caps safe (duplicate clusters are the
    one non-adversarial way a hash bucket gets huge)."""
    return df.groupBy(text_col).agg(F.min(id_col).alias(id_col))


def ngram_jaccard_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    threshold: float = 0.8,
    max_gram_docs: int = 10_000,
) -> DataFrame:
    """Capped n-gram Jaccard join for pipeline use.

    Unlike the exact operator, grams appearing in more than
    ``max_gram_docs`` documents are excluded from the candidate join (the
    exact sizes still count them), so reported jaccard is a lower bound and
    pairs similar ONLY through stop-grams may be missed; the join cost is
    bounded by max_gram_docs^2 per hot gram instead of corpus^2."""
    return dd.ngram_jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, max_gram_docs=max_gram_docs
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket_size: int = 65_536,
) -> DataFrame:
    """MinHash-LSH near-dup pairs over the exact-distinct corpus.

    Exact duplicates are collapsed first (their pairs are trivially
    jaccard=1 and belong to exact_dedup's clusters, not here). Band buckets
    hash into 2^64 space, so post-collapse a bucket only exceeds the cap
    under adversarial collisions — the generous fixed cap is safe at any
    corpus size. Pairs between members of a collapsed duplicate cluster are
    represented by the cluster representative."""
    uniq = _distinct_texts(df, id_col, text_col)
    return dd.minhash_lsh_pairs(
        uniq, id_col, text_col, n=n, num_perm=num_perm, bands=bands,
        threshold=threshold, verify=True, max_bucket_size=max_bucket_size,
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 8,
    n_rows: int | None = None,
    cap_mult: float = 8.0,
) -> DataFrame:
    """SimHash near-dup pairs with a corpus-scaled bucket cap.

    Chunk buckets have only 2^(64/chunks) values (256 at chunks=8), so the
    cap must grow with the corpus: auto_bucket_cap(n, 2^chunk_bits). Costs
    one count() job when ``n_rows`` is not supplied. Buckets beyond the cap
    (identical-simhash clusters surviving the exact-dup collapse) are
    dropped; recall for ordinary pairs is unaffected because the cap sits
    ``cap_mult`` times above the expected bucket size."""
    uniq = _distinct_texts(df, id_col, text_col)
    if n_rows is None:
        n_rows = uniq.count()
    cap = auto_bucket_cap(n_rows, 2 ** (64 // chunks), mult=cap_mult)
    return dd.simhash_pairs(
        uniq, id_col, text_col, max_hamming=max_hamming, chunks=chunks,
        max_bucket_size=cap,
    )


def embedding_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_tables: int = 8,
    bits_per_table: int = 4,
    seed: int = 11,
    dim: int | None = None,
    n_rows: int | None = None,
    cap_mult: float = 8.0,
) -> DataFrame:
    """Embedding near-dup pairs with a corpus-scaled bucket cap.

    The hyperplane LSH has just 2^bits_per_table buckets per table (16 by
    default) — the coarsest bucket space in the family and the reason a
    fixed cap is unsound here (ADVICE r2): ordinary buckets hold ~N/16
    vectors. auto_bucket_cap keeps the cap ``cap_mult`` expected-bucket
    sizes above that, so only identical/near-identical vector pileups are
    dropped. Costs one count() job when ``n_rows`` is not supplied."""
    if n_rows is None:
        n_rows = df.count()
    cap = auto_bucket_cap(n_rows, 2 ** bits_per_table, mult=cap_mult)
    return dd.embedding_neardup_pairs(
        df, id_col, vec_col, threshold=threshold, n_tables=n_tables,
        bits_per_table=bits_per_table, seed=seed, dim=dim, max_bucket_size=cap,
    )
