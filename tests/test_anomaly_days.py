"""Anomaly days: exact median/MAD recompute + planted-spike detection."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_median_mad_recompute(spark):
    out = entry.queries()["window_anomaly_days"](spark, SF_DIR).toPandas()
    xs = sorted(out.n_events.tolist())
    n = len(xs)
    med = xs[(n + 1) // 2 - 1]
    mad = sorted(abs(x - med) for x in xs)[(n + 1) // 2 - 1]
    assert (out.med == med).all()
    assert (out.mad == mad).all()
    for _, r in out.iterrows():
        dev = (1000 * abs(r.n_events - med)) // max(1, mad)
        assert r.dev_milli == dev
        assert r.anomaly == (dev >= 3000)


def test_planted_spike_flags(spark, tmp_path):
    # 20 quiet days at ~100 events, one day at 10x: only the spike flags
    rows = []
    uid = 0
    for d in range(20):
        cnt = 100 + (d % 3)
        for i in range(cnt):
            rows.append((uid, "view", d * 86400 + i))
            uid += 1
    for i in range(1000):
        rows.append((uid, "view", 20 * 86400 + i))
        uid += 1
    df = spark.createDataFrame(rows, "user_id long, event_type string, sec long")
    df = df.select(
        "user_id",
        "event_type",
        F.expr("cast(timestamp_seconds(sec) as timestamp)").alias("ts"),
    )
    d = str(tmp_path / "events.parquet")
    df.write.parquet(d)
    out = entry.queries()["window_anomaly_days"](spark, str(tmp_path)).toPandas()
    flagged = out[out.anomaly]
    assert len(flagged) == 1
    assert int(flagged.n_events.iloc[0]) == 1000
