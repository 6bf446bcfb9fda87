"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: annotate the sf0.001 documents stream with a
                 phrase dictionary (the reference's core capability) and
                 return exploded annotations.
queries()      — every implemented operator from SURVEY.md §2 (registry
                 in beagle_spark/queries.py).
oracle_sql()   — exactly-equivalent DuckDB SQL per query where the
                 semantics are SQL-expressible; non-SQL ops (LSH hash
                 families, winnowing, custom streaming) omit the oracle
                 and rely on golden tests (tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ensure the package resolves when this file is imported by path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from beagle_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from beagle_spark import Annotator

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dictionary = [
        {"text": "table scan", "id": "scan", "case-sensitive?": False},
        {"text": "hash join", "id": "join", "case-sensitive?": False, "slop": 1},
        {"text": "spark", "id": "spark", "synonyms": ["pyspark"]},
        {"text": "stream", "id": "stream", "stem?": True},
    ]
    ann = Annotator(dictionary)
    return ann.explode(docs, keep_cols=["doc_id", "lang", "source"]).orderBy(
        "doc_id", "begin_offset", "dict_entry_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
