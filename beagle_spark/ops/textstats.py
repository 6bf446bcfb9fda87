"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Every operator is a pure Spark SQL expression (no UDF) with an exact
DuckDB-SQL twin used as the correctness oracle — the expressions were
chosen so both engines compute bit-identical results (integer counts,
identically-rounded ratios, md5 on identical normalized strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny multilingual stopword sets for the n-gram/stopword language
# heuristic. Deliberately small + hardcoded: the heuristic must be
# reproducible in SQL on both engines.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "para"],
}


def tokens_ws(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count (runs of
    letters / digits / single punctuation), both JVM-side regex."""
    return df.select(
        F.col(id_col),
        F.size(tokens_ws(F.col(text_col))).alias("n_tokens_ws"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ).alias("n_tokens_bpeish"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cheap quality features + a composite score in [0,1]: length
    saturation, mean token length band, stopword presence. Mirrors
    published heuristic filters (C4/Gopher-style length & stopword
    rules) with exactly-SQL-reproducible arithmetic."""
    toks = tokens_ws(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(sw)))
    chars_per_token = F.round(n_chars.cast("double") / n_tokens, 3)
    stop_ratio = F.round(n_stop.cast("double") / n_tokens, 3)
    len_score = F.round(F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0)), 3)
    score = F.round(0.5 * len_score + 0.5 * F.least(stop_ratio * 5, F.lit(1.0)), 3)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        chars_per_token.alias("chars_per_token"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic: argmax over per-language
    stopword hit ratios; 'und' when no language clears 2%. (On the
    synthetic corpus every doc is English-vocabulary, so this predicts
    'en' — the lang column there is synthetic metadata, not signal.)"""
    toks = tokens_ws(F.col(text_col))
    n = F.size(toks)
    exprs = []
    for lang, words in STOPWORDS.items():
        ratio = F.size(F.filter(toks, lambda t: t.isin(words))).cast("double") / n
        exprs.append(F.struct(F.round(ratio, 4).alias("r"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*exprs))
    return df.select(
        F.col(id_col),
        F.when(best["r"] >= 0.02, best["lang"]).otherwise("und").alias("lang_pred"),
        best["r"].alias("stop_ratio"),
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase
    text. Identical function exists in DuckDB -> exact oracle."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col), F.md5(normalized.cast("binary")).alias("fingerprint")
    )


def winnow_fingerprint_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03): k-gram
    hashes, keep the min hash of every `window` consecutive hashes,
    emit the distinct selected hashes as (id, fp) rows.

    Relational plan (the round-2 version nested higher-order
    ``transform``s, re-evaluating the whole gram array — and the regexp
    normalization under it — per window position, interpreted, on one
    partition; it did not finish 500 docs in 15 min):

    1. project the normalized text once per document (the Generate
       operator's child projection materializes it, so the regexp runs
       once per doc, not once per gram),
    2. ``posexplode`` the per-position gram hashes (one O(len) pass),
    3. windowed ``min`` partitioned by doc (single hash shuffle —
       restores parallelism even from a single-file scan),
    4. ``distinct`` the selected hashes.

    The gram hash is md5 (hex string) rather than xxhash64 so DuckDB
    computes the identical fingerprint set — this makes the operator
    exactly oracle-able. At real scale swap ``F.md5(...)`` for
    ``F.xxhash64`` (cheaper, same plan shape, no SQL oracle).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col), norm.alias("_norm"))
    m = F.greatest(F.length("_norm") - (k - 1), F.lit(1))
    grams = base.select(
        F.col(id_col),
        m.alias("_m"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.md5(F.col("_norm").substr(i, F.lit(k)).cast("binary")),
            )
        ).alias("_pos", "_h"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(
        Window.currentRow, window - 1
    )
    return (
        grams.select(
            F.col(id_col),
            F.col("_pos"),
            F.col("_m"),
            F.min("_h").over(w).alias("fp"),
        )
        .where(F.col("_pos") <= F.greatest(F.col("_m") - window, F.lit(0)))
        .select(id_col, "fp")
        .distinct()
    )


def fingerprint_winnow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprint as a sorted array column.
    Thin aggregation over :func:`winnow_fingerprint_pairs` (see there
    for the plan rationale)."""
    pairs = winnow_fingerprint_pairs(df, text_col, id_col, k=k, window=window)
    return pairs.groupBy(id_col).agg(
        F.array_sort(F.collect_list("fp")).alias("winnow_fp")
    )
