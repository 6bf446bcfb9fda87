"""Mirror of the driver's t2 correctness gate: run every registered
query through Spark AND its DuckDB oracle at sf0.001/sf0.01 and compare
row counts + order-insensitive values (column-name sorted)."""

import math
import os

import duckdb
import pytest

from beagle_spark.queries import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 6)
    if isinstance(val, (list, tuple)):
        return tuple(_normalize(v) for v in val)
    return val


def _rows_to_set(columns, rows):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(_normalize(r[i]) for i in idx))
    return sorted(out, key=repr)


ORACLE_QUERIES = sorted(n for n, (_f, s) in REGISTRY.items() if s is not None)
ROWS_ONLY = sorted(n for n, (_f, s) in REGISTRY.items() if s is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(sql)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count differs"
    assert _rows_to_set(spark_cols, spark_rows) == _rows_to_set(ddb_cols, ddb_rows), (
        f"{name}: values differ"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
