"""Norm audit: unit-normalized fixture collapses to one bucket; a planted
mixed-scale batch splits into a second mode."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from pdfextract_spark.functions.similarity import norm_audit

SF_DIR = "/root/testdata/sf0.001"


def test_unit_fixture_single_mode(spark):
    out = entry.queries()["embed_norm_audit"](spark, SF_DIR).toPandas()
    # unit vectors: n2 ~ Q^2 = 10^8 -> all in one log2 bucket
    assert len(out) == 1
    assert int(out.share_pm.iloc[0]) == 1000
    assert out.lo_n2.iloc[0] <= 10**8 <= out.hi_n2.iloc[0]


def test_planted_mixed_batch_splits(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bad = emb.limit(10).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 4.0).alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
    out = norm_audit(emb.unionByName(bad)).toPandas()
    assert len(out) >= 2  # the 16x-n2 mode lands 4 buckets up
    assert int(out.n_vecs.sum()) == emb.count() + 10
