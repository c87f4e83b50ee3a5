#!/usr/bin/env python
"""Cluster entry point: the training-data RELEASE in one spark-submit pass.

    python tools/make_pyfiles.py            # builds dist/pdfextract_spark.zip
    spark-submit --py-files dist/pdfextract_spark.zip jobs/release_job.py \\
        --input  /path/to/documents.parquet \\
        --output /path/to/release_out \\
        [--target-tokens 2048] [--streams 8]

The last mile the individual queries rehearse, composed end-to-end:

  curation   strip -> redact -> quality/ppl gates -> dedup keeper -> sample
  split      leakage-safe train/val/test (coin keyed on the near-dup GROUP,
             so duplicates never straddle eval boundaries)
  pack       greedy fixed-budget packing PER SPLIT (per-split budgets;
             a sequence is keyed (split, stream, seq_id) — no mixed packs)
  layout     the ingest write spec (files per partition + salting dial)
  audit      the leakage audit — cross_split_pairs is the RELEASE GATE:
             nonzero means the group keying is broken and the job FAILS

Outputs under --output:
  packed/    partitioned by split
  layout/    per-source n_files / salt_bits / skewed
  audit/     (metric, value) rows
  metrics.json  the release summary (same Hadoop FS idiom as the data)

Scale discipline: every stage is the library kernel the driver gates —
curation is the hygiene chain (census-bounded boilerplate strip, one
keeper shuffle), the split rides the capped LSH pair graph, packing adds
ONE shuffle on (split, stream), the audit is pair-relation-sized."""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--target-tokens", type=int, default=None)
    ap.add_argument("--streams", type=int, default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("pdfextract-release")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from pdfextract_spark.functions.curation import (
        curation_kept,
        split_leakage_audit,
    )
    from pdfextract_spark.functions.packing import (
        LAYOUT_TARGET_TOKENS,
        N_STREAMS,
        layout_plan,
        pack_by_split,
    )

    target = args.target_tokens or LAYOUT_TARGET_TOKENS
    n_streams = args.streams or N_STREAMS
    docs = spark.read.parquet(args.input)

    kept = curation_kept(docs)
    # three consumers (split+pack inside pack_by_split, the audit, metrics)
    kept = kept.localCheckpoint(eager=False)

    packed = pack_by_split(kept, n_streams=n_streams)
    packed.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.output}/packed"
    )
    per_split = (
        spark.read.parquet(f"{args.output}/packed")
        .groupBy("split")
        .agg(
            F.countDistinct("stream", "seq_id").alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    )

    layout = layout_plan(docs, target=target)
    layout.write.mode("overwrite").parquet(f"{args.output}/layout")
    layout_rows = spark.read.parquet(f"{args.output}/layout").collect()

    audit = split_leakage_audit(kept)
    audit.write.mode("overwrite").parquet(f"{args.output}/audit")
    audit_rows = {
        r["metric"]: r["value"]
        for r in spark.read.parquet(f"{args.output}/audit").collect()
    }

    metrics = {
        "docs_in": docs.count(),
        "docs_kept": kept.count(),
        "splits": {
            r["split"]: {
                "n_seqs": r["n_seqs"],
                "n_docs": r["n_docs"],
                "n_tokens": r["n_tokens"],
            }
            for r in per_split
        },
        "layout_partitions": len(layout_rows),
        "layout_files": sum(r["n_files"] for r in layout_rows),
        "layout_skewed": sum(1 for r in layout_rows if r["skewed"]),
        "near_dup_groups": audit_rows.get("near_dup_groups", 0),
        "cross_split_pairs": audit_rows.get("cross_split_pairs", 0),
        "cross_split_pairs_naive": audit_rows.get("cross_split_pairs_naive", 0),
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
    gate_ok = metrics["cross_split_pairs"] == 0
    spark.stop()
    if not gate_ok:
        print("RELEASE GATE FAILED: cross_split_pairs != 0", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
