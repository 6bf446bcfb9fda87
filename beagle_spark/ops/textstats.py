"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Every operator is a pure Spark SQL expression (no UDF) with an exact
DuckDB-SQL twin used as the correctness oracle — the expressions were
chosen so both engines compute bit-identical results (integer counts,
identically-rounded ratios, md5 on identical normalized strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", Table A1) — the standard pre-training filters for
    boilerplate and degenerate text:

    - ``dup_line_frac``: fraction of lines that are duplicates of
      another line in the same document,
    - ``top_2gram_char_frac``: fraction of document characters covered
      by the most frequent word 2-gram (count * gram length / chars),
    - ``dup_5gram_char_frac``: fraction of characters covered by word
      5-grams occurring more than once (sum of count * length over
      duplicated grams / chars; overlaps counted, like the simple
      published formulation).

    Ties for the top 2-gram break on (count desc, gram desc) in BOTH
    engines so the result is deterministic and oracle-able.

    Plan shape: line stats are per-row array expressions (no shuffle);
    gram stats explode the materialized token array (the child
    projection keeps the split out of the per-gram loop) and aggregate
    on (doc, gram) with map-side partial agg, then on doc — two
    bounded hash shuffles, nothing quadratic, nothing interpreted in a
    hot loop. Scale-safe at 100 TB."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    line_stats = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_chars"),
        n_lines.alias("n_lines"),
        F.round(
            (n_lines - F.size(F.array_distinct(lines))).cast("double")
            / F.greatest(n_lines, F.lit(1)),
            4,
        ).alias("dup_line_frac"),
    )

    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
    )

    def gram_counts(k: int):
        n = F.size("_toks")
        grams = toks.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k)),
                )
            ).alias("gram"),
        )
        return grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))

    # top 2-gram per doc via max_by instead of a row_number window: the
    # (cnt, gram) struct max reproduces the (cnt DESC, gram DESC) tie
    # order exactly — (id, gram) rows are unique so no residual ties.
    # (Struct max_by still plans as SortAggregate, but the Window
    # buffer + rn filter are gone and the partial agg shrinks shuffle
    # input to one row per doc per map partition.)
    top2 = gram_counts(2).groupBy(id_col).agg(
        F.max_by(
            F.col("cnt") * F.length("gram"), F.struct("cnt", "gram")
        ).alias("_top2_chars")
    )
    dup5 = (
        gram_counts(5)
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
            ).alias("_dup5_chars")
        )
    )
    return (
        line_stats.join(top2, id_col, "left")
        .join(dup5, id_col, "left")
        .select(
            F.col(id_col),
            "n_lines",
            "dup_line_frac",
            F.round(
                F.coalesce(F.col("_top2_chars"), F.lit(0)).cast("double")
                / F.greatest(F.col("_chars"), F.lit(1)),
                4,
            ).alias("top_2gram_char_frac"),
            F.round(
                F.coalesce(F.col("_dup5_chars"), F.lit(0)).cast("double")
                / F.greatest(F.col("_chars"), F.lit(1)),
                4,
            ).alias("dup_5gram_char_frac"),
        )
    )


def quality_gopher(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-rule quality features + the pass/fail decision used to
    drop documents from a pre-training corpus:

    - ``mean_word_len``: non-whitespace chars / whitespace tokens
      (Gopher keeps documents with mean word length in [3, 10]),
    - ``symbol_word_ratio``: '#' and ellipsis occurrences per token
      (Gopher drops ratio > 0.1),
    - ``alpha_word_frac``: fraction of tokens containing at least one
      ASCII letter (Gopher drops < 0.8),
    - ``passes_gopher``: the conjunction, with the published
      thresholds, of the three rules above plus a 50-token minimum.

    Every feature is a closed-form SQL expression computable
    bit-identically in DuckDB; the only higher-order function is a
    single linear ``filter`` over the token array (same pattern as
    :func:`lang_id` — per-token work, never per-token-pair)."""
    toks = tokens_ws(F.col(text_col))
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    non_ws_chars = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    mean_word_len = F.round(non_ws_chars.cast("double") / n_tokens, 3)
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ellipsis = F.floor(
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
        )
        / 3
    ) + (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), "…", ""))
    )
    symbol_word_ratio = F.round((n_hash + n_ellipsis).cast("double") / n_tokens, 3)
    alpha_word_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n_tokens,
        3,
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        alpha_word_frac.alias("alpha_word_frac"),
        (
            (F.size(toks) >= 50)
            & mean_word_len.between(3.0, 10.0)
            & (symbol_word_ratio <= 0.1)
            & (alpha_word_frac >= 0.8)
        ).alias("passes_gopher"),
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

    MAP-ONLY relational plan (r21; the r3-r20 version posexploded the
    gram hashes, took a windowed min partitioned by doc — one full hash
    shuffle + sort of every gram row — then paid a second shuffle for
    the global ``distinct``. Winnowing is a pure per-document function,
    so both shuffles are removable):

    1. project the normalized text once per document,
    2. build the per-position gram-hash ARRAY in one projection
       (``_ghs`` is referenced more than once downstream, which stops
       Catalyst collapsing the projection into the window lambda and
       re-hashing the doc once per position — the interpreted
       higher-order-function trap, see :func:`~..dedup.shingle_docs`),
    3. per winnow position, ``array_min`` over the k-gram hash window
       (``slice`` truncates at the array tail exactly like the old
       ROWS frame did at the partition tail),
    4. ``array_distinct`` per doc, then ``explode`` to (id, fp) rows.

    No Exchange anywhere: selection happens inside the row, distinct-
    ness is per-document by construction. Skew stays bounded by doc
    length. At 100 TB this also removes the gram-row shuffle whose
    bytes were ~1.6x the corpus text.

    The gram hash is md5 (hex string) rather than xxhash64 so DuckDB
    computes the identical fingerprint set — this makes the operator
    exactly oracle-able. At real scale swap ``F.md5(...)`` for
    ``F.xxhash64`` (cheaper, same plan shape, no SQL oracle).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    m = F.greatest(F.length("_norm") - (k - 1), F.lit(1))
    ghs = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.md5(F.col("_norm").substr(i, F.lit(k)).cast("binary")),
    )
    base = df.select(F.col(id_col), norm.alias("_norm")).select(
        F.col(id_col), ghs.alias("_ghs")
    )
    # kept winnow positions: 1-based p in [1, greatest(m - window + 1, 1)]
    # (the old plan's  pos <= greatest(m - window, 0)  filter, 0-based)
    sel = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_ghs") - (window - 1), F.lit(1))),
        lambda p: F.array_min(F.slice(F.col("_ghs"), p, window)),
    )
    return base.select(F.col(id_col), F.explode(F.array_distinct(sel)).alias("fp"))


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
