"""Write-layout planning: file-count/salt arithmetic, skew flag contract,
conservation vs the raw corpus, DuckDB mirror equality."""

import duckdb
import math

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import packing

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def plan(spark):
    docs = spark.read.parquet(SF)
    return packing.layout_plan(docs).toPandas()


def test_arithmetic_invariants(plan):
    assert len(plan) > 0
    t = packing.LAYOUT_TARGET_TOKENS
    for r in plan.itertuples():
        assert r.n_files == max(1, math.ceil(r.n_tokens / t))
        assert r.salt_bits == (0 if r.n_files <= 1 else (r.n_files - 1).bit_length())
        # a 2^salt_bits salt space covers the file count
        assert 2**r.salt_bits >= r.n_files
    # integer-div truncation undershoots by < 1 milli per partition
    assert 1000 - len(plan) <= plan.share_milli.sum() <= 1000


def test_skew_flag(plan):
    mean = plan.n_tokens.sum() / len(plan)
    for r in plan.itertuples():
        assert r.skewed == (r.n_tokens > packing.LAYOUT_SKEW_X * mean)


def test_conservation(spark, plan):
    docs = spark.read.parquet(SF)
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    agg = docs.agg(
        F.count(F.lit(1)).alias("d"), F.sum(toks.cast("long")).alias("t")
    ).collect()[0]
    assert plan.n_docs.sum() == agg["d"]
    assert plan.n_tokens.sum() == agg["t"]


def test_mirror(spark, plan):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(packing.sql_layout_plan()).df()
    sp = plan.sort_values("source").reset_index(drop=True)
    du = du.sort_values("source").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
