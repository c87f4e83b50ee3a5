"""Sorted-export range plan: shards partition the corpus exactly, ranges
are contiguous and ordered, conservation holds, heavy equal-score runs are
reported not hidden, and the DuckDB mirror agrees bit-exactly."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import packing

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def test_partition_and_ordering(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = packing.export_plan(docs).toPandas().sort_values("shard_idx")
    assert int(out["n_docs"].sum()) == docs.count()
    # contiguous, non-overlapping ascending ranges
    assert (out["lo_pt"] <= out["hi_pt"]).all()
    his = out["hi_pt"].tolist()
    los = out["lo_pt"].tolist()
    for prev_hi, nxt_lo in zip(his, los[1:]):
        assert nxt_lo > prev_hi
    assert out["shard_idx"].between(0, packing.EXPORT_SHARDS - 1).all()


def test_heavy_score_reported_not_hidden(spark):
    # every doc scores the same point -> ONE shard takes everything and
    # vs_ideal_milli says so (k * 1000), the documented range-partition
    # limit for unsplittable equal keys
    rows = [(str(i), "uniform text the same every time") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = packing.export_plan(df, k=4).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["vs_ideal_milli"] == 4000
    assert out.iloc[0]["n_docs"] == 40


def test_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = packing.export_plan(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(packing.sql_export_plan()).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
