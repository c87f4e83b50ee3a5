"""Soak the checkpointed bucket pipeline at a more realistic bucket count:
replicate the sf0.1 corpus 20x (~100k docs), run run_extraction with
n_buckets=64 and concurrent submission, and report throughput + manifest
integrity. Prints one JSON line.

Usage: python tools/soak_pipeline.py [sf_dir] [repl] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, repl: int, n_buckets: int) -> None:
    from pyspark.sql import SparkSession, functions as F

    from pdfextract_spark.pipeline import metrics_summary, run_extraction
    from pdfextract_spark.sources.adapters import documents_to_interleaved

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pipeline-soak")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.environ["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + os.environ.get("PYTHONPATH", "")
    )

    inter = documents_to_interleaved(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    amp = (
        inter.repartition(cpus * 4)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("rep"),
            "doc_id",
            "spans",
        )
        .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
    )

    # deployment-shaped staging: ONE pass assigns buckets and writes a
    # bucket-partitioned table (the Iceberg bucket(doc_id, N) analog); the
    # per-bucket jobs then read with partition PRUNING instead of re-scanning
    # the whole corpus once per bucket
    from pdfextract_spark.pipeline import with_bucket

    staging = tempfile.mkdtemp(prefix="soak_staging_")
    t_stage = time.perf_counter()
    with_bucket(amp, n_buckets).write.mode("overwrite").partitionBy(
        "doc_bucket"
    ).parquet(staging)
    stage_s = time.perf_counter() - t_stage
    staged = spark.read.parquet(staging)
    n_docs = staged.count()

    out = tempfile.mkdtemp(prefix="soak_")
    t0 = time.perf_counter()
    res = run_extraction(
        spark, staged, out, n_buckets=n_buckets, parallelism=cpus, concurrency=4
    )
    wall = time.perf_counter() - t0

    manifest = json.loads(metrics_summary(spark, out))
    n_span_rows = spark.read.parquet(os.path.join(out, "spans")).count()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_buckets": n_buckets,
                "staging_write_s": round(stage_s, 1),
                "wall_s": round(wall, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "manifest": manifest,
                "span_rows_on_disk": n_span_rows,
                "buckets_done": len(res.buckets_done),
                "errors": res.total_errors,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
        int(sys.argv[3]) if len(sys.argv) > 3 else 64,
    )
