"""Streaming decontamination: batch equality (against BOTH the stateless
column twin and functions/decontam.contamination_report's join-based
batch path), planted-positive recovery, and exactly-once resume."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import decontam
from pdfextract_spark.streaming.decontam_stream import (
    bench_gram_set,
    decontam_columns,
    start_decontam_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_dirs(spark, tmp_path_factory):
    """(train_dir, bench_grams, split_df) from the synthesized eval split."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    split = decontam.synthesize_eval_split(docs)
    d = str(tmp_path_factory.mktemp("dc_in"))
    split.filter(F.col("role") == "train").select(
        "doc_id", F.col("text2").alias("text")
    ).coalesce(4).write.mode("overwrite").parquet(d)
    grams = bench_gram_set(
        split.filter(F.col("role") == "bench").select(
            F.col("text2").alias("text")
        )
    )
    assert grams  # the planted passage guarantees a non-empty set
    return d, grams, split


def test_stream_matches_batch_join_path(spark, split_dirs, tmp_path):
    train_dir, grams, split = split_dirs
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_decontam_stream(spark, train_dir, out, ckpt, grams)
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    # oracle 1: the stateless column twin on the same input
    want_cols = {
        r.doc_id: r
        for r in decontam_columns(
            spark.read.parquet(train_dir), grams
        ).collect()
    }
    # oracle 2: the batch join-based report over the same split
    want_join = {
        r.doc_id: r for r in decontam.contamination_report(split).collect()
    }
    assert set(got) == set(want_cols) == set(want_join)
    for k in got:
        assert got[k].n_hits == want_cols[k].n_hits == want_join[k].n_hits, k
        assert got[k].contaminated == want_join[k].contaminated, k
    # planted positives exist and are recovered
    assert sum(1 for r in got.values() if r.contaminated) > 0
    assert any(not r.contaminated for r in got.values())

    # exactly-once: re-draining with the same checkpoint adds nothing
    q2 = start_decontam_stream(spark, train_dir, out, ckpt, grams)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(got)


def test_bench_gram_cap_is_loud(spark, split_dirs):
    import pdfextract_spark.streaming.decontam_stream as ds

    _, grams, split = split_dirs
    old = ds.BENCH_GRAMS_CAP
    ds.BENCH_GRAMS_CAP = 1
    try:
        with pytest.raises(ValueError, match="BENCH_GRAMS_CAP"):
            bench_gram_set(
                split.filter(F.col("role") == "bench").select(
                    F.col("text2").alias("text")
                )
            )
    finally:
        ds.BENCH_GRAMS_CAP = old
