#!/usr/bin/env python
"""Isolated annotate_1m scaling probe (VERDICT r21 item 7).

Replicates bench.py's steady-state 1M-doc probe EXACTLY (same corpus
replication, same partitioning clamp, same varied map-side expression)
but runs it alone at an explicit core count, bracketed by the load
sentinel, so the 8-vs-32-core ratio can be read in a quiet window
without the rest of the suite contaminating it.

Usage: python tools/probe_annotate.py <cpus> <out.jsonl> [probe_docs]
Appends one JSON line: {"cpus", "sentinel": [pre, post], "probe_secs",
"docs_per_sec", "n_docs"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    cpus = int(sys.argv[1])
    out_path = sys.argv[2]
    probe_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"probe-annotate-{cpus}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_dictionary, sentinel_sec
    from beagle_spark import Annotator

    sent_pre = sentinel_sec(spark)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_part = max(1, min(cpus, n_docs // 500))
    docs = docs.repartition(n_part).cache()
    docs.count()

    warm = Annotator(make_dictionary(100))
    warm.annotate_df(docs).select(F.sum(F.size("annotations"))).collect()

    repl = max(1, (probe_docs + n_docs - 1) // n_docs)
    big = (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(repl))))
        .drop("_r")
        .repartition(cpus)
        .persist()
    )
    n_big = big.count()
    ann5k = Annotator(make_dictionary(5_000))
    secs = []
    for i in (1, 2, 3, 4):
        out_big = ann5k.annotate_df(big).select(
            (F.sum(F.size("annotations") + i) - F.lit(i * n_big)).alias("n")
        )
        t0 = time.monotonic()
        out_big.collect()
        secs.append(round(time.monotonic() - t0, 3))
        print(f"  cpus={cpus} run {i}: {secs[-1]}s ({n_big/secs[-1]:.0f} docs/s)",
              file=sys.stderr, flush=True)
    big.unpersist()
    sent_post = sentinel_sec(spark)
    med = sorted(secs)[len(secs) // 2]
    rec = {
        "cpus": cpus,
        "sentinel": [sent_pre, sent_post],
        "probe_secs": secs,
        "median_sec": med,
        "docs_per_sec": round(n_big / med, 1),
        "n_docs": n_big,
    }
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
