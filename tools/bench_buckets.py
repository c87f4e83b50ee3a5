"""Measure run_extraction inter-bucket dead time: serial (concurrency=1) vs
concurrent (concurrency=4) bucket submission at n_buckets=16 on the sf0.1
corpus. Prints one JSON line with both walls and the speedup.

Usage: python tools/bench_buckets.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    from pdfextract_spark.pipeline import run_extraction
    from pdfextract_spark.sources.adapters import documents_to_interleaved

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bucket-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
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
    docs = documents_to_interleaved(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).localCheckpoint(eager=True)

    results = {}
    for conc in (1, 4):
        out = tempfile.mkdtemp(prefix=f"bucketbench_c{conc}_")
        t0 = time.perf_counter()
        res = run_extraction(
            spark, docs, out, n_buckets=16, parallelism=cpus, concurrency=conc
        )
        wall = time.perf_counter() - t0
        results[f"concurrency_{conc}"] = round(wall, 2)
        results[f"docs_{conc}"] = res.total_docs
        shutil.rmtree(out, ignore_errors=True)
    results["speedup"] = round(
        results["concurrency_1"] / results["concurrency_4"], 3
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
