"""Text analysis operators (training-data pipeline): stats/quality scoring,
language-ID heuristic, BPE-ish token counting, rolling-hash fingerprints.

Everything except ``fingerprint`` is built-in JVM expressions. The language
heuristic is a stopword-hit ratio over a small built-in lexicon — exactly
the n-gram/stopword heuristic class the brief names, no models."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deliberately simple, deterministic definitions shared with oracles
_WS = r"\s+"
_PUNCT = r"[^\w\s]"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "are"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "pour", "que", "une"],
    "es": ["el", "la", "los", "las", "es", "no", "por", "con", "una", "para"],
}


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc stats: char/token counts, punctuation + whitespace + stopword
    ratios — the standard quality-filter features."""
    toks = F.split(F.trim(F.col(text_col)), _WS)
    n_chars = F.length(text_col)
    n_tokens = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(F.size(toks))
    n_punct = F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), _PUNCT, ""))
    n_spaces = F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    mean_tok_len = F.when(n_tokens > 0, (n_chars - n_spaces) / n_tokens).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        mean_tok_len.cast("double").alias("mean_tok_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic 0..1 quality score from length / punctuation / token
    shape (a Gopher-rules-style filter, arithmetic only)."""
    s = text_stats(df, id_col, text_col)
    len_ok = F.when((F.col("n_chars") >= 20) & (F.col("n_chars") <= 20000), 1.0).otherwise(0.0)
    tok_ok = F.when((F.col("mean_tok_len") >= 2.0) & (F.col("mean_tok_len") <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    ntok_ok = F.when(F.col("n_tokens") >= 5, 1.0).otherwise(0.0)
    return s.select(
        id_col,
        ((len_ok + tok_ok + punct_ok + ntok_ok) / 4.0).alias("quality"),
    )


def token_count_bpe(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token count under the BPE-ish regex pre-tokenizer (words / numbers /
    symbols), the usual 'how many tokens is this corpus' estimator."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0)
    return df.select(F.col(id_col), F.size(toks).cast("long").alias("n_bpe_tokens"))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax stopword-hit count over the lexicon,
    'und' (undetermined) when nothing hits. One pass, JVM-side."""
    words = F.split(F.lower(F.col(text_col)), _WS)
    scores = []
    for lang, sw in _STOPWORDS.items():
        lex = F.array(*[F.lit(w) for w in sw])
        hits = F.size(F.array_intersect(words, lex))
        # weight by total occurrences, not just distinct hits
        occ = F.aggregate(
            words,
            F.lit(0),
            lambda acc, w: acc + F.when(F.array_contains(lex, w), 1).otherwise(0),
        )
        scores.append(F.struct(occ.alias("score"), hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["score"].cast("long").alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling hash over all
    ``window``-grams (robust to small edits). xxhash64 per gram, min-agg."""
    grams = df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(text_col) - (window - 1), F.lit(1))),
                lambda i: F.col(text_col).substr(i, F.lit(window)),
            )
        ).alias("gram"),
    )
    return grams.groupBy(id_col).agg(F.min(F.xxhash64("gram")).alias("fingerprint"))
