"""Relational host surface (SURVEY.md section 2 Part C-1).

These are plain Spark DataFrame queries over the TPC-H-ish testdata —
the point is to prove the engine embeds in real relational pipelines
and that the plans Catalyst produces are the ones you'd want at 100 TB:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema),
- small dims (region/nation/customer at these SFs) broadcast,
- aggregations are partial (map-side) before the shuffle,
- window/top-k uses a single shuffle per partitioning.

Every computed column is aliased to match the DuckDB oracle exactly
(driver hash-compares by sorted column name). Float aggregates are
rounded identically on both sides to keep value-hashes stable across
summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as long (nanosAsLong) and truncate to
    microseconds — the same truncation DuckDB applies when casting
    nanos to its micro-precision TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        # parquet NANOS is isAdjustedToUTC=false (wall clock): build a
        # TIMESTAMP_NTZ so results are independent of the session
        # timezone (DuckDB's TIMESTAMP is also naive) — collected
        # values then hash-match regardless of driver TZ config.
        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            raw = raw.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
            # force analysis while the TZ pin is active; the cast is
            # folded with UTC semantics into the resolved plan
            raw.schema
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return raw


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg + sort."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q2_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelates to a left-semi join (broadcast or shuffled-hash
    chosen by AQE based on the build side size)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.where(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        .join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q2_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q3_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join. Only the FIXED-SIZE dims (nation: 25 rows,
    region: 5 rows) carry explicit broadcast hints; customer grows with
    SF, so its join strategy is left to the planner/AQE — broadcast at
    test scale, shuffled hash/SMJ at 100 TB. Hinting it would pin a
    plan that breaks at scale."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return (
        orders.join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q3_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q4_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        # no broadcast hint: customer is SF-proportional; AQE picks
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


Q4_SQL = """
SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q5_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window, batch form. The streaming form is the
    same plan over readStream + watermark (see streaming.py)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("window.start").alias("hour_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "hour_start")
    )


Q5_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour_start,
       count(*) AS n_events, round(sum(value), 3) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q6_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_id", "value", F.row_number().over(w).alias("rn")
        )
        .orderBy("user_id", "rn")
        .limit(1000)
    )


Q6_SQL = """
SELECT user_id, event_id, value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
ORDER BY user_id, rn
LIMIT 1000
"""


def q7_documents_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source", "lang")
    )


Q7_SQL = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def q8_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed Spark-first: instead of a range/inequality
    join (quadratic without a specialized operator), tag the build-side
    rows, union, and take `last(..., ignorenulls)` over an event-time
    window per key — one shuffle on user_id, linear scan per partition.
    DuckDB oracle uses its native ASOF JOIN."""
    ev = load(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    tagged = ev.select(
        "user_id", "ts", "event_id", "event_type", F.lit(None).cast("timestamp_ntz").alias("signup_ts")
    ).unionByName(
        signups.select(
            "user_id",
            F.col("signup_ts").alias("ts"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            "signup_ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("signup_ts").isNull().cast("int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_signup_ts", F.last("signup_ts", ignorenulls=True).over(w))
        .where(F.col("event_id").isNotNull())
        .select("event_id", "user_id", "last_signup_ts")
        .orderBy("event_id")
    )


Q8_SQL = """
SELECT e.event_id, e.user_id, s.ts AS last_signup_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
ORDER BY e.event_id
"""


def q9_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min inactivity gap) per user — the batch
    form of Spark's session_window; in streaming this is the built-in
    stateful session aggregation (state bounded by watermark). The
    DuckDB oracle derives sessions relationally (lag + running sum of
    gap breaks) — same semantics, engine-neutral."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


Q9_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, round(sum(value), 3) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def q10_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large x medium join: lineitem x part with aggregation pushed
    below the join where possible. At real SF part is too big to
    broadcast — pre-aggregate lineitem by partkey FIRST (shrinks the
    fact side to one row per key), then join; AQE picks the strategy."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    li_agg = li.groupBy("l_partkey").agg(
        # money arithmetic in DECIMAL: exact and summation-order-independent,
        # so the value hash matches the oracle regardless of partitioning
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        li_agg.join(part, li_agg.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("revenue"), 2).cast("double").alias("brand_revenue"),
            F.sum("n_lines").alias("n_lines"),
        )
        .orderBy(F.desc("brand_revenue"), "p_brand")
    )


Q10_SQL = """
WITH li_agg AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS revenue,
         count(*) AS n_lines
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(round(sum(revenue), 2) AS DOUBLE) AS brand_revenue,
       CAST(sum(n_lines) AS BIGINT) AS n_lines
FROM li_agg JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY brand_revenue DESC, p_brand
"""


def q11_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier x nation rollup with a having-filter on the aggregate —
    exercises the last unused table; nation broadcast."""
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    li_per_supp = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(li_per_supp, sup.s_suppkey == li_per_supp.l_suppkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            # avg via exact decimal sum / count: order-independent, one
            # deterministic double division + round at the very end
            F.round(
                F.sum(F.col("s_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count("s_acctbal"),
                2,
            ).alias("avg_acctbal"),
            F.sum(F.coalesce("n_lines", F.lit(0))).alias("total_lines"),
        )
        .where(F.col("n_suppliers") > 1)
        .orderBy("n_name")
    )


Q11_SQL = """
WITH li_per_supp AS (
  SELECT l_suppkey, count(*) AS n_lines FROM lineitem GROUP BY l_suppkey
)
SELECT n_name, count(*) AS n_suppliers,
       round(CAST(sum(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE)
             / count(s_acctbal), 2) AS avg_acctbal,
       CAST(sum(coalesce(n_lines, 0)) AS BIGINT) AS total_lines
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
LEFT JOIN li_per_supp ON s_suppkey = l_suppkey
GROUP BY n_name
HAVING count(*) > 1
ORDER BY n_name
"""


def q12_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event type (Spark `percentile` == DuckDB
    `quantile_cont`, both linear interpolation). The 100 TB variant
    swaps in percentile_approx (t-digest sketch, mergeable, one pass);
    exact percentile is the oracle-comparable form."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


Q12_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation (orders
    per customer -> customers per order-count)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join: customers with no orders."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("c_mktsegment")
    )


Q14_SQL = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""
