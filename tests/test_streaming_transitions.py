"""Streaming transition census: drained delta sums equal the batch census
under in-order delivery, single- and multi-micro-batch, including
cross-batch boundary pairs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdfextract_spark.streaming.transitions_stream import (
    TRANS_GAP_US,
    transition_deltas,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_census(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev["t"] = pd.to_datetime(ev.ts).astype("int64") // 1000
    out = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["t", "event_id"])
        t = g.t.to_numpy()
        ty = g.event_type.to_numpy()
        for i in range(len(g) - 1):
            if t[i + 1] - t[i] <= TRANS_GAP_US:
                k = (ty[i], ty[i + 1])
                out[k] = out.get(k, 0) + 1
    return out


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # time-ordered slices: the in-order delivery contract
    d = str(tmp_path_factory.mktemp("trans_in"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev = ev.withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
    tq = ev.approxQuantile("t", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + tq + [float("inf")]
    for i in range(4):
        ev.filter(
            (F.col("t") > bounds[i]) & (F.col("t") <= bounds[i + 1])
        ).drop("t").coalesce(1).write.mode("overwrite").parquet(f"{d}/slice={i}")
    return d


def _run(spark, events_dir, name, max_files):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{events_dir}/slice=*")
    )
    q = (
        transition_deltas(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(f"SELECT src, dst, SUM(d) AS n FROM {name} GROUP BY 1, 2").toPandas()
    return {(r.src, r.dst): r.n for r in pdf.itertuples()}


def test_stream_equals_batch_multi_microbatch(spark, events_dir, batch_census):
    got = _run(spark, events_dir, "trans_multi", 1)
    assert got == batch_census


def test_stream_equals_batch_single_microbatch(spark, events_dir, batch_census):
    got = _run(spark, events_dir, "trans_single", 16)
    assert got == batch_census
