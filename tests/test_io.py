"""I/O surface tests: batch + stream sources and sinks."""

import pytest
from pyspark.sql import functions as F

from beagle_spark import io as bio
from beagle_spark import Annotator


def test_batch_roundtrip(spark, sf_dir, tmp_path):
    docs = bio.read_documents(spark, f"{sf_dir}/documents.parquet")
    assert docs.count() > 0
    ann = Annotator([{"text": "table", "case-sensitive?": False}]).explode(
        docs, keep_cols=["doc_id", "source"]
    )
    out = str(tmp_path / "anns")
    bio.write_annotations(ann, out, partition_by=["source"])
    back = spark.read.parquet(out)
    assert back.count() == ann.count()
    assert "source" in back.columns  # partition column survives


def test_csv_source(spark, tmp_path):
    p = str(tmp_path / "docs_csv")
    spark.createDataFrame([(1, "a table here")], ["doc_id", "text"]).write.option(
        "header", True
    ).csv(p)
    df = bio.read_documents(spark, p, fmt="csv")
    assert df.count() == 1


def test_stream_source_and_sink(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    src = str(tmp_path / "ssrc")
    docs.coalesce(1).write.parquet(src)
    stream = bio.read_document_stream(
        spark, src, fmt="parquet", schema=docs.schema, max_files_per_trigger=1
    )
    annotated = Annotator([{"text": "table", "case-sensitive?": False}]).annotate_df(
        stream
    )
    out = str(tmp_path / "sout")
    q = bio.write_annotation_stream(
        annotated.withColumn("n", F.size("annotations")).drop("annotations"),
        out,
        checkpoint_dir=str(tmp_path / "sckpt"),
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 20


def test_bad_formats_rejected(spark):
    with pytest.raises(ValueError):
        bio.read_documents(spark, "/tmp/x", fmt="avro")
    with pytest.raises(ValueError):
        bio.read_document_stream(spark, "topic", fmt="kafka")
    with pytest.raises(ValueError):
        bio.read_document_stream(spark, "/tmp/x", fmt="parquet")  # schema required
