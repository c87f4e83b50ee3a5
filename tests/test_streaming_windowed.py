"""Watermarked windowed aggregation + stateful operator over an event
stream: the streamed results must equal the batch computation (which is the
oracle, since the watermark only bounds lateness it never changes on-time
results when the backlog is drained in order)."""

import pytest

from pdfextract_spark.streaming.windowed import (
    running_user_totals,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_in"))
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def test_windowed_counts_stream_equals_batch(spark, events_dir, tmp_path):
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in windowed_event_counts(spark.read.parquet(events_dir)).collect()
    }
    stream_in = (
        spark.readStream.schema(spark.read.parquet(events_dir).schema)
        .parquet(events_dir)
    )
    q = (
        windowed_event_counts(stream_in)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # append mode only emits windows the watermark has closed; every emitted
    # window must match the batch result exactly, and most windows close
    assert streamed, "no windows emitted"
    for k, v in streamed.items():
        assert batch[k] == v, k
    assert len(streamed) >= len(batch) * 0.8


def test_running_user_totals_stateful(spark, events_dir, tmp_path):
    ev = spark.read.parquet(events_dir)
    import pyspark.sql.functions as F

    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    stream_in = (
        spark.readStream.schema(ev.schema).parquet(events_dir)
    )
    q = (
        running_user_totals(stream_in)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, n_events, total FROM running_totals"
    ).collect()
    # last update per user wins
    got = {}
    for r in rows:
        got[r["user_id"]] = (r["n_events"], r["total"])
    assert got == expected
