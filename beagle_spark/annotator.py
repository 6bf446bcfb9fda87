"""Public annotate API.

Two surfaces:

1. `highlighter(dictionary, opts)` — driver/local callable with the
   reference's calling convention (reference:
   src/beagle/phrases.clj:236-273): compile once, then
   `fn(text) -> [annotation dict]`. Used to port the reference's test
   suite verbatim and as the per-row core of the Spark operator.

2. `Annotator` / `annotate_df(df, text_col, ...)` — the Spark-native
   operator (no reference equivalent; the whole point of this engine).
   The compiled dictionary is broadcast once; matching runs as an
   Arrow-batched pandas UDF producing an `array<struct>` annotations
   column. Stateless per row => identical on batch and streaming
   DataFrames, embarrassingly parallel, no shuffle (SURVEY.md section 3.4).

Scale notes (100 TB design):
- dictionary compile is driver-only; executors receive the compiled,
  prefilter-indexed program via SparkContext.broadcast (one copy per
  executor, not per task).
- per-doc cost is bounded by the presearcher-style candidate pruning
  (FieldProgram.candidates) — O(distinct doc tokens x postings hit),
  matching only candidate queries, mirroring Lucene Monitor's scaling
  trick (README.md:183-184 floor behavior).
- the UDF is stateless => Catalyst can pipeline it after pushed-down
  filters; no shuffle is introduced by annotation itself.
- partition sizing: keep >= ~500 docs per task (the pandas-UDF analog
  of maxPartitionBytes). Over-splitting a small input across many
  Python workers trades trivial per-task work for per-batch Arrow +
  worker overhead and cache contention — measured 2.6x slower at 32
  partitions vs 8 on a 5k-doc corpus (bench.py sizes its input
  accordingly; at 100 TB the scan produces full splits naturally).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .dictionary.optimizer import optimize
from .dictionary.validator import validate_dictionary
from .matcher import CompiledDictionary, compile_dictionary, match_text
from .schema import ANNOTATIONS_TYPE, DictionaryEntry

__all__ = ["highlighter", "Annotator", "annotate_df"]

_OPT_ALIASES = {
    "type-name": "type_name",
    "validate-dictionary?": "validate_dictionary",
    "optimize-dictionary?": "optimize_dictionary",
    "merge-annotations?": "merge_annotations",
    "case-sensitive?": "case_sensitive",
    "ascii-fold?": "ascii_fold",
    "stem?": "stem",
    "in-order?": "in_order",
}


def _norm_opts(opts: dict | None) -> dict:
    out = {}
    for k, v in (opts or {}).items():
        k = str(k).lstrip(":")
        k = _OPT_ALIASES.get(k, k.replace("-", "_").rstrip("?"))
        out[k] = v
    return out


def _compile(dictionary, opts: dict | None) -> CompiledDictionary:
    """Compile-phase of the reference highlighter (phrases.clj:265-273):
    optional validation, optional optimization, default type name."""
    opts = _norm_opts(opts)
    entries = [
        e if isinstance(e, DictionaryEntry) else DictionaryEntry.from_dict(e)
        for e in dictionary
    ]
    if opts.pop("validate_dictionary", False):
        validate_dictionary([e.to_dict() for e in entries], raise_on_error=True)
    if opts.pop("optimize_dictionary", False):
        entries = [
            DictionaryEntry.from_dict(d)
            for d in optimize([e.to_dict() for e in entries])
        ]
    type_name = opts.pop("type_name", None) or "PHRASE"
    merge = bool(opts.pop("merge_annotations", False))
    return compile_dictionary(
        entries, default_conf=opts, type_name=type_name, merge_annotations=merge
    )


def highlighter(dictionary, opts: dict | None = None):
    """Reference-parity local API: returns fn(text) -> [annotation]."""
    cd = _compile(dictionary, opts)

    def annotate(text: str, per_call_opts: dict | None = None) -> list[dict]:
        merge = None
        if per_call_opts:
            merge = _norm_opts(per_call_opts).get("merge_annotations")
        return match_text(text, cd, merge=merge)

    annotate.compiled = cd  # type: ignore[attr-defined]
    return annotate


# deprecated variant kept for API parity (phrases.clj:275-284)
annotator = highlighter


class Annotator:
    """Spark-facing annotator: compile on the driver, broadcast, annotate
    whole DataFrames (batch or streaming)."""

    def __init__(self, dictionary, opts: dict | None = None):
        self.compiled = _compile(dictionary, opts)
        self._bc = None

    # -- local (driver-side) ------------------------------------------------
    def annotate(self, text: str) -> list[dict]:
        return match_text(text, self.compiled)

    # -- distributed ----------------------------------------------------------
    def _broadcast(self, spark: SparkSession):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.compiled)
        return self._bc

    def udf(self, spark: SparkSession):
        """Arrow-batched pandas UDF: string column -> array<struct> of
        annotations. Iterator form so the broadcast is resolved once per
        partition, not once per batch.

        Marked NON-DETERMINISTIC (it is pure, but this stops the
        optimizer pushing filters below it WITH A COPY of the UDF —
        spark_optimization_guide.md §4.4). Before this, every query of
        the form annotate -> filter/explode evaluated the dictionary
        match TWICE per document, and the pushed copy ran below the
        caller's repartition, i.e. single-threaded on a single-file
        scan (see plans/r21/t5_dict_match_counts_before.txt: two
        ArrowEvalPython nodes, the lower one under the Exchange)."""
        bc = self._broadcast(spark)

        @pandas_udf(ANNOTATIONS_TYPE)
        def annotate_series(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            cd = bc.value
            for series in batches:
                yield series.map(lambda t: match_text(t, cd))

        return annotate_series.asNondeterministic()

    def annotate_df(
        self,
        df: DataFrame,
        text_col: str = "text",
        output_col: str = "annotations",
    ) -> DataFrame:
        """Append an `annotations: array<struct>` column. Works on batch
        and streaming DataFrames alike (stateless row map)."""
        spark = df.sparkSession
        fn = self.udf(spark)
        return df.withColumn(output_col, fn(F.col(text_col)))

    def explode(
        self,
        df: DataFrame,
        text_col: str = "text",
        keep_cols: Optional[list[str]] = None,
    ) -> DataFrame:
        """Annotate then explode to one row per annotation (documents with
        no matches drop out), with the annotation struct flattened."""
        ann = self.annotate_df(df, text_col=text_col, output_col="_ann")
        keep = keep_cols if keep_cols is not None else df.columns
        exploded = ann.select(*keep, F.explode("_ann").alias("a"))
        return exploded.select(
            *keep,
            F.col("a.text").alias("match_text"),
            F.col("a.type").alias("match_type"),
            F.col("a.dict_entry_id").alias("dict_entry_id"),
            F.col("a.meta").alias("match_meta"),
            F.col("a.begin_offset").alias("begin_offset"),
            F.col("a.end_offset").alias("end_offset"),
        )


def annotate_df(
    df: DataFrame,
    dictionary,
    text_col: str = "text",
    opts: dict | None = None,
    output_col: str = "annotations",
) -> DataFrame:
    """One-shot convenience: annotate `df[text_col]` with `dictionary`."""
    return Annotator(dictionary, opts).annotate_df(df, text_col, output_col)


def register_sql_function(
    spark: SparkSession,
    dictionary,
    name: str = "beagle_annotate",
    opts: dict | None = None,
) -> Annotator:
    """Expose the annotator to Spark SQL:
    ``SELECT beagle_annotate(text) FROM docs`` (SURVEY.md section 2
    Part B: the matcher as a UDF surface). The dictionary is bound at
    registration; returns the Annotator for re-registration on refresh."""
    ann = Annotator(dictionary, opts)
    spark.udf.register(name, ann.udf(spark))
    return ann
