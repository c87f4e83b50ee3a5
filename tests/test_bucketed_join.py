"""Co-located joins: bucket(doc_id)-clustered outputs join with ZERO
Exchange — the shuffle-free path every doc_id-keyed downstream join takes."""

import shutil

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.pipeline import write_bucketed_spans


def test_bucketed_join_has_no_exchange(spark):
    try:
        spans = spark.range(0, 500).select(
            F.col("id").cast("string").alias("doc_id"),
            F.lit("text").alias("kind"),
            F.lit("body").alias("text"),
        )
        emb = spark.range(0, 500).select(
            F.col("id").cast("string").alias("doc_id"),
            (F.col("id") * 3).alias("score"),
        )
        write_bucketed_spans(spans, "t_spans_b", n_buckets=4)
        write_bucketed_spans(emb, "t_embed_b", n_buckets=4)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_spans_b").join(spark.table("t_embed_b"), "doc_id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:800]
            assert "Bucketed: true" in plan
            assert j.count() == 500
        finally:
            if old is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_spans_b")
        spark.sql("DROP TABLE IF EXISTS t_embed_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
