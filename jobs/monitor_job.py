#!/usr/bin/env python
"""Cluster entry point: corpus observability in one spark-submit pass.

    spark-submit --py-files dist/pdfextract_spark.zip jobs/monitor_job.py \\
        --input  /path/to/documents.parquet \\
        --output /path/to/monitor_out \\
        [--part-buckets 256]

The continuous-pipeline monitoring relations a corpus operator alarms on,
computed together so the snapshot they describe is consistent:

  hll/        per-host HyperLogLog distinct-doc estimates (+ exact audit)
  hitters/    count-min heavy hitters with exact verified counts
  drift/      per-language bucketed token-share L1 between snapshot halves
  partition/  bucket(doc_id, N) layout skew audit (max/mean + Gini milli)

Scale discipline: every relation is sketch- or census-bounded (registers,
2048 CMS cells, langs x 1024 drift buckets, N layout buckets) — none keys
a shuffle on an unbounded domain; the corpus is scanned once per relation
and never regrouped on doc content. metrics.json summarizes the alarms
(drift L1, layout Gini, hitter count, HLL error) and goes through the
SAME Hadoop filesystem as the data writes so an object-store deployment
needs no extra client."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--part-buckets", type=int, default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("pdfextract-monitor")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from pdfextract_spark.functions.packing import PART_BUCKETS, partition_audit
    from pdfextract_spark.functions.sketches import heavy_hitters, hll_host_distinct
    from pdfextract_spark.functions.textops import snapshot_drift

    n_buckets = args.part_buckets or PART_BUCKETS
    docs = spark.read.parquet(args.input)

    hll = hll_host_distinct(docs)
    hll.write.mode("overwrite").parquet(f"{args.output}/hll")
    hll_rows = spark.read.parquet(f"{args.output}/hll").collect()

    hitters = heavy_hitters(docs)
    hitters.write.mode("overwrite").parquet(f"{args.output}/hitters")
    n_hitters = spark.read.parquet(f"{args.output}/hitters").count()

    drift = snapshot_drift(docs)
    drift.write.mode("overwrite").parquet(f"{args.output}/drift")
    drift_rows = spark.read.parquet(f"{args.output}/drift").collect()

    part = partition_audit(docs, n_buckets=n_buckets)
    part.write.mode("overwrite").parquet(f"{args.output}/partition")
    part_row = spark.read.parquet(f"{args.output}/partition").collect()[0]

    metrics = {
        "docs_in": docs.count(),
        "hosts": len(hll_rows),
        "hll_mean_err_permille": (
            sum(r["err_permille"] for r in hll_rows) // max(1, len(hll_rows))
        ),
        "heavy_hitters": n_hitters,
        "drift_langs": len(drift_rows),
        "drift_max_l1_ppm": max((r["l1_ppm"] for r in drift_rows), default=0),
        "partition_buckets": part_row["n_buckets"],
        "partition_maxmean_milli": part_row["maxmean_milli"],
        "partition_gini_milli": part_row["gini_milli"],
    }
    # metrics via the same Hadoop FS as the data writes (hygiene_job idiom)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    mpath = jvm.org.apache.hadoop.fs.Path(f"{args.output}/metrics.json")
    fs = mpath.getFileSystem(conf)
    stream = fs.create(mpath, True)
    try:
        stream.write(bytearray(json.dumps(metrics, indent=1).encode("utf-8")))
    finally:
        stream.close()
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
