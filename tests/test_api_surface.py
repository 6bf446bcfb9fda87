"""API-surface parity: dictionary writers round-trip, SQL function
registration, DictionaryEntry conversions."""

import io

from beagle_spark import DictionaryEntry, highlighter
from beagle_spark.dictionary.readers import read_csv, read_json
from beagle_spark.dictionary.writers import write_csv, write_json


def test_json_roundtrip():
    d = [
        {"text": "test phrase", "id": "1", "synonyms": ["tp"],
         "case-sensitive?": False, "meta": {"k": "v"}},
        {"text": "other", "slop": 2},
    ]
    buf = io.StringIO()
    write_json(d, buf)
    buf.seek(0)
    back = read_json(buf)
    assert back[0]["text"] == "test phrase"
    assert back[0]["case-sensitive?"] is False
    assert back[1]["slop"] == 2
    # compiled behavior identical
    assert highlighter(back)("a test phrase here") == highlighter(d)("a test phrase here")


def test_csv_roundtrip():
    d = [
        {"text": "test phrase", "id": "1", "synonyms": ["tp", "t p"],
         "case-sensitive?": True, "meta": {"k": "v", "k2": "v2"}, "slop": 1},
    ]
    buf = io.StringIO()
    write_csv(d, buf)
    buf.seek(0)
    back = read_csv(io.StringIO(buf.getvalue()))
    assert back[0]["text"] == "test phrase"
    assert back[0]["synonyms"] == ["tp", "t p"]
    assert back[0]["case-sensitive?"] is True
    assert back[0]["meta"] == {"k": "v", "k2": "v2"}
    assert back[0]["slop"] == 1


def test_dictionary_entry_aliases():
    e = DictionaryEntry.from_dict(
        {":text": "x", "case-sensitive?": False, "in-order?": True,
         "fuzzy?": True, "meta": {":lbl": "v"}}
    )
    assert e.case_sensitive is False
    assert e.in_order is True
    assert e.fuzzy is True
    assert e.meta == {"lbl": "v"}


def test_sql_function_registration(spark):
    from beagle_spark.annotator import register_sql_function

    register_sql_function(
        spark, [{"text": "table scan", "id": "p", "case-sensitive?": False}]
    )
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView(
        "docs_v"
    )
    row = spark.sql(
        "SELECT count(*) AS n FROM docs_v WHERE size(beagle_annotate(text)) > 0"
    ).collect()[0]
    assert row["n"] > 0
