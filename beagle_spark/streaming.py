"""Structured Streaming surface.

The annotate operator is a stateless row map, so `Annotator.annotate_df`
works unchanged on streaming DataFrames (tested batch==streaming in
tests/test_spark_annotate.py). This module adds the stream-specific
pieces the reference never had (its "in-stream" usage is a library call
per document, README.md:11):

- annotate_stream: readStream -> annotate -> (optional) explode
- windowed_annotation_counts: event-time tumbling windows + watermark
  over the annotation stream (late data handled by Spark state GC)
- run_with_dictionary_refresh: foreachBatch driver that recompiles +
  re-broadcasts the dictionary when its source changes — the Spark
  equivalent of updating Lucene Monitor's query index in place.

Scale notes: annotation adds no shuffle to a stream; only the windowed
aggregation shuffles (keyed by window x type). State size is bounded by
the watermark horizon; choose shuffle partitions to match key
cardinality (event types x windows), not input volume.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .annotator import Annotator


def annotate_stream(
    stream_df: DataFrame,
    dictionary,
    text_col: str = "text",
    opts: dict | None = None,
    explode: bool = False,
) -> DataFrame:
    ann = Annotator(dictionary, opts)
    if explode:
        return ann.explode(stream_df, text_col=text_col)
    return ann.annotate_df(stream_df, text_col=text_col)


def windowed_annotation_counts(
    annotated: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts of annotations per dictionary entry with a
    watermark for late data (SURVEY.md Q5 streaming form)."""
    return (
        annotated.withWatermark(ts_col, watermark)
        .select(ts_col, F.explode("annotations").alias("a"))
        .groupBy(
            F.window(ts_col, window).alias("w"),
            F.col("a.dict_entry_id").alias("dict_entry_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(
            F.col("w.start").alias("window_start"),
            "dict_entry_id",
            "n_matches",
        )
    )


def stateful_match_totals(
    exploded_annotations: DataFrame,
    timeout_minutes: int = 0,
):
    """Custom stateful streaming operator via applyInPandasWithState:
    running total of matches per dictionary entry across micro-batches
    (what the reference's users script around the library by hand).

    State per dict_entry_id is a single counter — O(#dictionary) total
    state, independent of stream length. An optional processing-time
    timeout expires idle entries. Input: the exploded annotation stream
    (explode=True), needing columns dict_entry_id (+ any)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    out_schema = StructType(
        [
            StructField("dict_entry_id", StringType()),
            StructField("total_matches", LongType()),
        ]
    )
    state_schema = StructType([StructField("n", LongType())])

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"dict_entry_id": [key[0]], "total_matches": [n]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return exploded_annotations.groupBy("dict_entry_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


def stream_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop documents whose normalized-text hash
    was already seen within the watermark horizon. Uses Spark's stateful
    dropDuplicates — state is GC'd past the watermark, so memory is
    bounded by (arrival rate x horizon), not stream length."""
    hashed = stream_df.withColumn(
        "_text_hash",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").cast("binary")
        ),
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicates(["_text_hash"])
        .drop("_text_hash")
    )


def run_with_dictionary_refresh(
    stream_df: DataFrame,
    load_dictionary: Callable[[], list[dict]],
    sink: Callable[[DataFrame, int], None],
    text_col: str = "text",
    opts: dict | None = None,
    checkpoint_dir: Optional[str] = None,
    refresh_every_n_batches: int = 10,
):
    """foreachBatch loop that re-reads the dictionary source every N
    micro-batches and recompiles/re-broadcasts it (the old broadcast is
    unpersisted). Dictionary updates take effect at a batch boundary —
    the same consistency unit as the reference's thread-safe Monitor
    updates (CHANGELOG:36-39)."""
    state = {"annotator": Annotator(load_dictionary(), opts), "batches": 0}

    def process(batch_df: DataFrame, batch_id: int):
        if state["batches"] and state["batches"] % refresh_every_n_batches == 0:
            old = state["annotator"]
            state["annotator"] = Annotator(load_dictionary(), opts)
            if old._bc is not None:
                old._bc.unpersist()
        state["batches"] += 1
        sink(state["annotator"].annotate_df(batch_df, text_col=text_col), batch_id)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
