"""estimate_scan_splits must model Spark's small-file bin-packing: many tiny
files scan as FEW tasks, so the fan-out heuristic must not treat file count
as split count (round-2 advice finding)."""

import os

import pandas as pd

from pdfextract_spark.scanutil import estimate_scan_splits


def test_many_small_files_estimate_below_file_count(spark, tmp_path):
    path = str(tmp_path / "tiny")
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(120)], "v": range(120)})
    # 40 separate tiny parquet files
    spark.createDataFrame(pdf).repartition(40).write.parquet(path)
    df = spark.read.parquet(path)
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files >= 30
    est = estimate_scan_splits(df)
    # openCost 4MB, maxPartitionBytes 128MB -> ~40*4MB/128MB = 2 splits
    assert 1 <= est <= 4, est
    assert est < n_files


def test_no_files_returns_zero(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2]}))
    assert estimate_scan_splits(df) == 0
