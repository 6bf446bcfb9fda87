#!/usr/bin/env python
"""Paired A/B bench runner: times a subset of registry queries (noop
sink, bench.py methodology) in THIS tree. Run it alternately from two
worktrees to get interleaved paired samples.

Usage: python tools/paired_bench.py <label> <out_jsonl> <query> [query ...]
Appends one JSON line: {"label":..., "queries": {name: [pass secs...]}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("PAIRED_PASSES", "3"))


def main():
    label, out_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"paired-{label}")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from beagle_spark.queries import REGISTRY

    # warm-up: scans + one untimed pass of each target query
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()
    for name in names:
        REGISTRY[name][0](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(PASSES):
        for name in names:
            fn, _ = REGISTRY[name]
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.monotonic() - t0, 3))
    with open(out_path, "a") as f:
        f.write(json.dumps({"label": label, "queries": times}) + "\n")
    for n in names:
        print(f"{label} {n}: min {min(times[n]):.3f} all {times[n]}",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
