#!/usr/bin/env python
"""Cluster entry point: INCREMENTAL reprocess between two crawl snapshots.

    python tools/make_pyfiles.py            # builds dist/pdfextract_spark.zip
    spark-submit --py-files dist/pdfextract_spark.zip jobs/snapshot_job.py \\
        --snapshot-a /path/to/old/documents.parquet \\
        --snapshot-b /path/to/new/documents.parquet \\
        --output /path/to/incr_out
    # sandbox mode: --input <documents.parquet> synthesizes the two
    # snapshots deterministically (webclean.synthesize_snapshots)

The month-over-month pipeline the snapshot_diff relation motivates: only
ADDED + CHANGED documents re-enter extraction; carried (unchanged) and
retired (removed) docs cost nothing. At CommonCrawl churn rates (~30-40%
monthly) that is a 2.5-3x saving over full reprocess, read straight off
this job's metrics.

Flow (every stage a driver-gated library kernel):
  diff       per-doc status via ONE fingerprint full-outer join
             (webclean.snapshot_status)
  reprocess  snapshot B's added+changed rows -> interleaved adapter ->
             extract_spans (the flagship per-doc pipeline)
  outputs    spans/ (reprocessed docs only), diff/ (per-doc status),
             metrics.json via the Hadoop FS idiom

Scale shape: the diff joins two thin (doc_id, md5) projections —
exchange-free when snapshots are stored bucket(doc_id) with persisted
fingerprints (PLANS.md, incremental dedup layout); the reprocess set never
includes the unchanged mass, so extraction cost tracks churn, not corpus
size."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="single corpus: synthesize snapshots")
    ap.add_argument("--snapshot-a")
    ap.add_argument("--snapshot-b")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    if not args.input and not (args.snapshot_a and args.snapshot_b):
        ap.error("--input or both --snapshot-a/--snapshot-b required")

    spark = (
        SparkSession.builder.appName("pdfextract-snapshot")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from pdfextract_spark.functions.webclean import (
        snapshot_status,
        synthesize_snapshots,
    )
    from pdfextract_spark.operators.extract import extract_spans
    from pdfextract_spark.sources.adapters import documents_to_interleaved

    if args.input:
        snap_a, snap_b = synthesize_snapshots(spark.read.parquet(args.input))
    else:
        snap_a = spark.read.parquet(args.snapshot_a).select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        snap_b = spark.read.parquet(args.snapshot_b).select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
    snap_b = snap_b.localCheckpoint(eager=False)  # diff + reprocess join

    status = snapshot_status(snap_a, snap_b)
    status.write.mode("overwrite").parquet(f"{args.output}/diff")
    status = spark.read.parquet(f"{args.output}/diff")

    reprocess = snap_b.join(
        status.filter(F.col("status").isin("added", "changed")).select(
            "doc_id"
        ),
        "doc_id",
    )
    # the interleaved adapter keys docs numerically; new-in-B ids carry the
    # synthesizer's 'n' prefix, so they map injectively into a reserved
    # numeric range (production snapshots use numeric ids throughout)
    NEW_ID_BASE = 5_000_000_000
    extract_in = reprocess.select(
        F.when(
            F.col("doc_id").startswith("n"),
            F.expr(f"CAST(substring(doc_id, 2) AS LONG) + {NEW_ID_BASE}"),
        )
        .otherwise(F.col("doc_id").cast("long"))
        .cast("string")
        .alias("doc_id"),
        "text",
    )
    spans = extract_spans(documents_to_interleaved(extract_in))
    spans.write.mode("overwrite").parquet(f"{args.output}/spans")

    census = {
        r["status"]: r["n"]
        for r in status.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_spans = spark.read.parquet(f"{args.output}/spans").count()
    n_reprocessed = reprocess.count()
    total_b = snap_b.count()
    metrics = {
        "diff": census,
        "docs_in_b": total_b,
        "docs_reprocessed": n_reprocessed,
        "docs_carried": census.get("unchanged", 0),
        "docs_retired": census.get("removed", 0),
        "spans_written": n_spans,
        "reprocess_pm": (1000 * n_reprocessed) // max(1, total_b),
    }
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
