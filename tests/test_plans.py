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
