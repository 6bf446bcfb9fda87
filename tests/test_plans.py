"""Plan-quality assertions: the optimizations we rely on at 100 TB must
actually appear in the physical plan (SURVEY.md section 4)."""

import pytest

from beagle_spark import relational as R


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(R.q1_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: untouched wide columns must not be read
    assert "l_comment" not in plan
    assert "l_partkey" not in plan
    # partial (map-side) aggregation before the shuffle
    assert "HashAggregate" in plan


def test_q3_broadcasts_dimensions(spark):
    plan = plan_of(R.q3_region_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q6_single_shuffle_for_window(spark):
    plan = plan_of(R.q6_window_rownum(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange") <= 2  # partitionBy shuffle (+AQE final)
    assert "Window" in plan


def test_annotate_no_shuffle(spark):
    from beagle_spark import Annotator

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = Annotator([{"text": "table"}]).annotate_df(docs)
    plan = plan_of(df)
    assert "Exchange" not in plan  # stateless map: no shuffle introduced
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_exact_dedup_partial_agg(spark):
    from beagle_spark.ops.dedup import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(exact_dedup(docs))
    # two HashAggregates around one Exchange = map-side partial agg
    assert plan.count("HashAggregate") >= 2
    assert "text_hash" in plan


def test_topk_is_take_ordered(spark):
    from beagle_spark.ops.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [0.1] * 64
    plan = plan_of(brute_force_topk(emb, q, k=10))
    assert "TakeOrderedAndProject" in plan  # not a global sort


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    from beagle_spark.ops.rollup import bucketed_join, write_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 4
        )
        write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 4)
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "k")
        plan = plan_of(joined)
        assert "Exchange" not in plan  # co-located: bucketing replaced the shuffle
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_rollup_merge_equals_direct(spark):
    from beagle_spark.ops.rollup import build_rollup, merge_rollups, query_rollup
    from beagle_spark.relational import load_events
    from pyspark.sql import functions as F

    ev = load_events(spark, "/root/testdata/sf0.001")
    # split into two "ingests", roll up each, merge, query
    r1 = build_rollup(ev.where(F.col("event_id") % 2 == 0), "ts", ["event_type"], "value")
    r2 = build_rollup(ev.where(F.col("event_id") % 2 == 1), "ts", ["event_type"], "value")
    merged = query_rollup(merge_rollups(r1, r2), ["event_type"]).orderBy("event_type")
    direct = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("total"),
            F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("avg_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .orderBy("event_type")
    )
    assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in direct.collect()]


def test_salted_join_row_identical(spark):
    from beagle_spark.ops.skew import salted_count, salted_join
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # nanos ts unused here; keep columns simple
    facts = ev.select("event_id", "user_id", "event_type")
    dims = facts.select("user_id").distinct().withColumn(
        "segment", F.pmod("user_id", F.lit(3))
    )
    plain = facts.join(dims, "user_id").orderBy("event_id")
    salted = salted_join(facts, dims, "user_id", n_salts=4,
                         salt_source="event_id").orderBy("event_id")
    assert sorted(plain.columns) == sorted(salted.columns)
    cols = sorted(plain.columns)
    assert [tuple(r[c] for c in cols) for r in plain.collect()] == [
        tuple(r[c] for c in cols) for r in salted.collect()
    ]

    counted = {r["user_id"]: r["n"] for r in salted_count(facts, "user_id").collect()}
    direct = {
        r["user_id"]: r["count"]
        for r in facts.groupBy("user_id").count().collect()
    }
    assert counted == direct


def test_salted_count_spreads_hot_key(spark):
    """A planted hot key must be split across ~n_salts partial groups in
    the first aggregation stage — the whole point of salting. (The r1
    implementation salted by hash(key), which is constant per key and
    spread nothing.)"""
    from pyspark.sql import functions as F

    hot = spark.range(10_000).select(F.lit("whale").alias("k"))
    cold = spark.range(100).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
    df = hot.unionByName(cold)

    n_salts = 8
    # replicate salted_count's partial stage to count distinct salts per key
    partial = (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
        )
        .groupBy("k", "_salt")
        .count()
    )
    hot_groups = partial.where(F.col("k") == "whale").count()
    assert hot_groups >= n_salts - 1, f"hot key landed in only {hot_groups} groups"

    from beagle_spark.ops.skew import salted_count

    got = {r["k"]: r["n"] for r in salted_count(df, "k", n_salts=n_salts).collect()}
    assert got["whale"] == 10_000
    assert len(got) == 101


def test_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").drop("ts")
    path = str(tmp_path / "ev_by_type")
    ev.write.partitionBy("event_type").parquet(path)
    q = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = plan_of(q)
    # the partition filter must reach the scan: only one partition read
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert q.count() == ev.where(F.col("event_type") == "click").count()
