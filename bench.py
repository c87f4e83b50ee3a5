#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--scaling` additionally runs the flagship extraction job at two parallelism
levels (local[8] vs local[32] as the N vs 4N proxy — BASELINE.md protocol) and
writes BENCH/BASELINE.md with docs/sec at both plus the scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession  # noqa: E402


def make_spark(cores: int, app: str = "pdfextract-bench") -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _run_query(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()  # full materialization
    assert n >= 0
    return time.perf_counter() - t0


def run_suite(spark, sf_dir: str) -> dict:
    from pdfextract_spark import queries as q

    timings = {}
    for name, fn in q.queries().items():
        timings[name] = round(_run_query(fn, spark, sf_dir), 3)
    return timings


def run_scaling(sf_dir: str, n_docs: int, pair=(8, 32)) -> dict:
    """Same flagship job, same input, two parallelism levels (N vs 4N proxy)."""
    from pdfextract_spark.operators.extract import extract_spans
    from pdfextract_spark.sources.adapters import documents_to_interleaved

    results = {}
    for cores in pair:
        spark = make_spark(cores, app=f"scaling-{cores}")
        try:
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            inter = documents_to_interleaved(docs)
            # warm JVM/Arrow path once on a slice, then time the real run
            extract_spans(inter.limit(32), num_partitions=cores).count()
            t0 = time.perf_counter()
            extract_spans(inter, num_partitions=cores * 4).count()
            dt = time.perf_counter() - t0
            results[cores] = {"sec": round(dt, 3), "docs_per_sec": round(n_docs / dt, 2)}
        finally:
            spark.stop()
    lo, hi = pair
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    results["efficiency"] = round(eff, 3)
    results["pair"] = list(pair)
    return results


def write_bench_md(sf_dir: str, sf: float, scaling: dict, timings: dict) -> None:
    os.makedirs(os.path.join(_REPO, "BENCH"), exist_ok=True)
    lo, hi = scaling["pair"]
    eff = scaling["efficiency"]
    ok = "PASS" if eff >= 0.8 else "FAIL"
    lines = [
        "# BENCH — measured results (sandbox protocol, BASELINE.md)",
        "",
        f"Input: `{sf_dir}` (sf={sf}), same deterministic corpus + identical code at both levels.",
        "",
        "## Scaling (N vs 4N parallelism proxy)",
        "",
        "| cores | wall sec | docs/sec |",
        "| --- | --- | --- |",
        f"| local[{lo}] (N) | {scaling[lo]['sec']} | {scaling[lo]['docs_per_sec']} |",
        f"| local[{hi}] (4N) | {scaling[hi]['sec']} | {scaling[hi]['docs_per_sec']} |",
        "",
        f"**Scaling efficiency = (throughput_4N / throughput_N) / 4 = {eff}** → "
        f"{ok} (target ≥ 0.8)",
        "",
        "## Per-query timings (local[32], seconds)",
        "",
        "| query | sec |",
        "| --- | --- |",
    ]
    lines += [f"| {k} | {v} |" for k, v in sorted(timings.items())]
    lines.append("")
    with open(os.path.join(_REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="also run the two-level scaling protocol and write BENCH/BASELINE.md")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    spark = make_spark(cpus)
    try:
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        t0 = time.perf_counter()
        timings = run_suite(spark, sf_dir)
        total = time.perf_counter() - t0
    finally:
        spark.stop()

    out = {
        "metric": "suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "extract_docs_per_sec": round(n_docs / timings["extract_pipeline"], 2)
        if timings.get("extract_pipeline")
        else None,
    }

    if args.scaling:
        scaling = run_scaling(sf_dir, n_docs)
        out["scaling"] = scaling
        write_bench_md(sf_dir, sf, scaling, timings)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
