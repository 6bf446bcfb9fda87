#!/usr/bin/env python
"""Stage-level profile of the dd_minhash_lsh pipeline (guide §1): times
each internal stage in isolation with the noop sink, prints plan excerpts
for the signature stage, and reports whether the 64-aggregate falls out
of whole-stage codegen.

Usage: python tools/profile_minhash.py [n_repeats]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=3):
    secs = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        secs.append(time.monotonic() - t0)
    print(f"{label}: min {min(secs):.3f}s  all {[f'{s:.2f}' for s in secs]}",
          flush=True)
    return min(secs)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("minhash-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from beagle_spark.ops import dedup
    from beagle_spark.queries import _docs_dedup

    docs = _docs_dedup(spark, SF_DIR)
    docs.count()  # warm scan

    # Stage 1: shingling
    sh = dedup.shingle_docs(docs, "text", "doc_id", 3)
    timed("1. shingle_docs", lambda: noop(sh), n)

    # Persist shingles as the pipeline does
    shp = dedup.shingle_docs(docs, "text", "doc_id", 3).persist()
    shp.count()

    # Stage 2: signature stage from persisted shingles
    sig = dedup.minhash_signature_stage(docs, "text", "doc_id", 64, 3, shingled=shp)
    timed("2. signature stage (from persisted shingles)", lambda: noop(sig), n)

    # Stage 2b: just the explode+hash, no aggregate
    exploded = shp.select("id", F.explode("shingles").alias("_sh")).withColumn(
        "_h", F.xxhash64("_sh")
    )
    timed("2b. explode+xxhash64 only", lambda: noop(exploded), n)

    # Stage 2c: explode+hash+64 derived hashes, no aggregate
    derived = exploded.select(
        "id", *[F.xxhash64("_h", F.lit(i)).alias(f"_d{i}") for i in range(64)]
    )
    timed("2c. explode + 64 derived hashes (no agg)", lambda: noop(derived), n)

    # Stage 3: banding + grouped bucket pairs + candidate agg
    cands = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", 64, 16, 3, shingled=shp, bucket_cap=1000
    )
    timed("3. full candidates (sig+band+pairs)", lambda: noop(cands), n)

    # Stage 4: full verified pipeline (what the bench times)
    timed(
        "4. minhash_lsh_verified full",
        lambda: noop(dedup.minhash_lsh_verified(docs, "text", "doc_id", 0.8)),
        n,
    )

    shp.unpersist()

    # Plan of the signature stage: look for codegen fallback
    plan = sig._jdf.queryExecution().executedPlan().toString()
    import re as _re

    head = "\n".join(plan.splitlines()[:40])
    print("\n=== signature stage executedPlan (head) ===")
    print(head)
    n_codegen = len(_re.findall(r"WholeStageCodegen", plan))
    print(f"\nWholeStageCodegen spans: {n_codegen}")
    print("HashAggregate outside codegen:",
          bool(_re.search(r"^(?!.*\*\().*HashAggregate", plan, _re.M)))


if __name__ == "__main__":
    main()
