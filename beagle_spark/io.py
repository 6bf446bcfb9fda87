"""Source/sink surface.

The reference has no connectors at all — documents arrive as function
arguments and results are returned in-memory (readers.clj handles only
dictionary files). On Spark the whole source/sink matrix is built in;
this module pins the supported surface explicitly, with the options a
100 TB deployment needs (partition sizing, kafka offsets, checkpoints).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

BATCH_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_partition_bytes: Optional[str] = None,
) -> DataFrame:
    """Batch document source. `max_partition_bytes` tunes split size so
    a partition of documents fits executor memory next to the broadcast
    dictionary (spark.sql.files.maxPartitionBytes)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format {fmt!r}")
    if max_partition_bytes:
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    return getattr(reader, fmt)(path)


def read_document_stream(
    spark: SparkSession,
    path_or_topic: str,
    fmt: str = "parquet",
    schema=None,
    kafka_servers: Optional[str] = None,
    starting_offsets: str = "latest",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming document source: file-based (parquet/json/csv/text) or
    kafka (value bytes -> string `text` column). Kafka requires the
    spark-sql-kafka package on the cluster; file sources work anywhere."""
    if fmt == "kafka":
        if not kafka_servers:
            raise ValueError("kafka source needs kafka_servers")
        from pyspark.sql import functions as F

        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_servers)
            .option("subscribe", path_or_topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
        return raw.select(
            F.col("key").cast("string").alias("doc_id"),
            F.col("value").cast("string").alias("text"),
            F.col("timestamp").alias("ts"),
        )
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported stream format {fmt!r}")
    reader = spark.readStream
    if schema is None:
        raise ValueError("file streams require an explicit schema")
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "csv":
        reader = reader.option("header", True)
    return getattr(reader, fmt)(path_or_topic)


def write_annotations(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Batch sink. Partition by a low-cardinality provenance column
    (source/date), never by doc_id."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)


def write_annotation_stream(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    trigger_seconds: Optional[int] = None,
):
    """Streaming sink with mandatory checkpoint (exactly-once for file
    sinks)."""
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
