"""Streaming daily census: exact batch equality under any micro-batch
partition/arrival order, and batch-identical anomaly flags on the drain."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.streaming.anomaly_stream import anomaly_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch(spark):
    import __spark_entry__ as entry

    return (
        entry.queries()["window_anomaly_days"](spark, SF_DIR)
        .toPandas()
        .set_index("day")
    )


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("anom_in"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for i, m in enumerate([1, 3, 0, 2]):
        ev.filter(F.col("user_id") % 4 == m).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/slice={i}")
    return d


def _drain(spark, events_dir, name, max_files):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{events_dir}/slice=*")
    )
    q = (
        anomaly_stream(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    return pdf.groupby("day").tail(1).set_index("day").n_events


def test_multi_microbatch_equals_batch(spark, events_dir, batch):
    got = _drain(spark, events_dir, "anom_multi", 1)
    assert dict(got) == dict(batch.n_events)


def test_single_microbatch_equals_batch(spark, events_dir, batch):
    got = _drain(spark, events_dir, "anom_single", 16)
    assert dict(got) == dict(batch.n_events)


def test_flags_recomputed_on_drain_match(spark, events_dir, batch):
    got = _drain(spark, events_dir, "anom_flags", 2)
    xs = sorted(got.tolist())
    n = len(xs)
    med = xs[(n + 1) // 2 - 1]
    mad = sorted(abs(x - med) for x in xs)[(n + 1) // 2 - 1]
    for day, cnt in got.items():
        dev = (1000 * abs(cnt - med)) // max(1, mad)
        assert (dev >= 3000) == bool(batch.loc[day].anomaly)
