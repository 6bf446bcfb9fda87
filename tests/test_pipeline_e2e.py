"""End-to-end training-data pipeline composition: the "switch from the
reference" story — read, dedup, quality-filter, lang-id, annotate,
aggregate, write — one lazy Spark plan chain."""

from pyspark.sql import functions as F

from beagle_spark import Annotator
from beagle_spark.ops import dedup, textstats


def test_full_pipeline(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. exact dedup: keep canonical doc per normalized text
    canon = dedup.exact_dedup(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    deduped = docs.join(canon, "doc_id")

    # 2. quality + language gates
    quality = textstats.quality_score(deduped).select("doc_id", "quality_score")
    lang = textstats.lang_id(deduped).select("doc_id", "lang_pred")
    gated = (
        deduped.join(quality, "doc_id")
        .join(lang, "doc_id")
        .where((F.col("quality_score") >= 0.2) & (F.col("lang_pred") != "und"))
    )

    # 3. annotate survivors, roll up matches by source
    ann = Annotator(
        [
            {"text": "table scan", "id": "scan", "case-sensitive?": False},
            {"text": "hash join", "id": "join", "case-sensitive?": False, "slop": 1},
        ]
    )
    rolled = (
        ann.explode(gated, keep_cols=["doc_id", "source"])
        .groupBy("source", "dict_entry_id")
        .count()
    )

    out = str(tmp_path / "pipeline_out")
    rolled.write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {"source", "dict_entry_id", "count"}
    total_in = docs.count()
    assert gated.count() <= total_in  # gates only remove
