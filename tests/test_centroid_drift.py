"""Centroid drift: planted-corruption separation — poisoning one half of a
label's vectors shows up as drift, clean labels stay near sampling noise."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from pdfextract_spark.functions.clustering import centroid_drift

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_bounds(spark):
    out = entry.queries()["embed_dim_stats"](spark, SF_DIR)  # warm session
    drift = entry.queries()["embed_centroid_drift"](spark, SF_DIR).toPandas()
    assert (drift.n_a >= 1).all() and (drift.n_b >= 1).all()
    assert (drift.d2 >= 0).all()
    assert (drift.drift_micro2 == drift.d2 // 64).all()


def test_planted_corruption_separates(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # corrupt ONE half of label 0: saturate the embedding to +0.9
    half = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cd|"), F.col("vec_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    poisoned = emb.withColumn(
        "embedding",
        F.when(
            (F.col("label") == 0) & (half == 1),
            F.transform("embedding", lambda e: F.lit(0.9)),
        ).otherwise(F.col("embedding")),
    )
    clean = centroid_drift(emb).toPandas().set_index("label")
    bad = centroid_drift(poisoned).toPandas().set_index("label")
    # label 0's drift explodes past every clean label's
    assert bad.loc[0].d2 > clean.d2.max() * 10
    # other labels' rows are untouched
    for lbl in clean.index:
        if lbl != 0:
            assert bad.loc[lbl].d2 == clean.loc[lbl].d2
