"""Streaming funnel: the per-user depth histogram streamed across
time-ordered micro-batches must equal the batch windowFunnel query (the
left-to-right DP is exact under consecutive time-sorted chunks with a
carried accumulator)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.streaming.funnel_stream import funnel_depths

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_hist(spark):
    from pdfextract_spark.queries import q_window_funnel

    return {
        r["depth"]: r["n_users"] for r in q_window_funnel(spark, SF_DIR).collect()
    }


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # three consecutive event-time slices written sequentially: file mtime
    # order == event-time order, so micro-batches respect the in-order
    # delivery contract
    d = str(tmp_path_factory.mktemp("funnel_in"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "_t", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    q1, q2 = ev.approxQuantile("_t", [0.33, 0.66], 0.0)
    slices = [
        ev.filter(F.col("_t") < q1).drop("_t"),
        ev.filter((F.col("_t") >= q1) & (F.col("_t") < q2)).drop("_t"),
        ev.filter(F.col("_t") >= q2).drop("_t"),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.mode("overwrite").parquet(f"{d}/slice={i}")
    return d


def test_stream_equals_batch(spark, events_dir, batch_hist, tmp_path):
    ev_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream_in = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{events_dir}/slice=*")
    )
    q = (
        funnel_depths(stream_in)
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, MAX(depth) AS depth FROM funnel_stream GROUP BY user_id"
    ).collect()
    got = Counter(r["depth"] for r in rows)
    assert dict(got) == batch_hist


def test_single_microbatch_fold(spark, events_dir, batch_hist, tmp_path):
    # all slices in ONE micro-batch (no file limit): a single fold per
    # user == the batch DP exactly — micro-batch granularity is invisible
    ev_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream_in = spark.readStream.schema(ev_schema).parquet(f"{events_dir}/slice=*")
    q = (
        funnel_depths(stream_in)
        .writeStream.format("memory")
        .queryName("funnel_single")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, MAX(depth) AS depth FROM funnel_single GROUP BY user_id"
    ).collect()
    got = Counter(r["depth"] for r in rows)
    assert dict(got) == batch_hist


def test_depth_monotone_across_batches(spark, events_dir, tmp_path):
    # re-run keeping every update row: a user's emitted depths never
    # decrease across micro-batches (accumulators only grow)
    ev_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream_in = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{events_dir}/slice=*")
    )
    q = (
        funnel_depths(stream_in)
        .writeStream.format("memory")
        .queryName("funnel_monotone")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    import pandas as pd

    pdf = spark.sql("SELECT * FROM funnel_monotone").toPandas()
    # memory sink appends in batch order; within a user the sequence of
    # depths must be non-decreasing
    for _, grp in pdf.groupby("user_id"):
        ds = grp["depth"].tolist()
        assert ds == sorted(ds), ds
