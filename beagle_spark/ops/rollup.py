"""Hypertable-style continuous aggregates + bucketed co-location.

Two scale primitives the relational surface leans on at 100 TB:

- Rollups (continuous aggregates): maintain a small pre-aggregated
  table of MERGEABLE partials (count/sum/min/max per time bucket x
  dims). Queries over long ranges hit the rollup instead of the fact
  table; partials from different ingests merge by re-aggregation —
  the TimescaleDB continuous-aggregate / materialized-view pattern
  expressed as plain Spark jobs over partitioned parquet.

- Bucketed tables: pre-shuffle both sides of a recurring join on the
  join key ONCE at write time (CLUSTERED BY ... INTO n BUCKETS); every
  subsequent join on that key is exchange-free (SortMergeJoin with no
  Exchange). This is how a 100 TB fact-to-fact join avoids paying the
  shuffle per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERGEABLE_AGGS = ("count", "sum", "min", "max")


def build_rollup(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    value_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """One rollup row per (time bucket x dims) with mergeable partials."""
    return df.groupBy(
        F.window(ts_col, bucket).alias("w"), *dims
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ).select(F.col("w.start").alias("bucket_start"), *dims, "cnt", "sum_v", "min_v", "max_v")


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Merge partial rollups (e.g. per-ingest increments) by
    re-aggregation — count/sum add, min/max combine. avg derives as
    sum/cnt at query time (never store non-mergeable aggregates)."""
    base = rollups[0]
    for r in rollups[1:]:
        base = base.unionByName(r)
    dims = [c for c in base.columns if c not in ("cnt", "sum_v", "min_v", "max_v")]
    return base.groupBy(*dims).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def query_rollup(rollup: DataFrame, dims: list[str]) -> DataFrame:
    """Final aggregates from partials (avg = sum/cnt)."""
    return rollup.groupBy(*dims).agg(
        F.sum("cnt").alias("n"),
        F.round(F.sum("sum_v"), 3).alias("total"),
        F.round(F.sum("sum_v") / F.sum("cnt"), 6).alias("avg_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table: the one-time shuffle that
    makes every later equi-join/agg on `bucket_col` exchange-free."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name, format="parquet")


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The physical
    plan must contain no Exchange (asserted in tests/test_plans.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
