"""Streaming bot detection: exact batch equality under in-order (time-
sliced) delivery, boundary gaps included."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.streaming.bot_stream import bot_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch(spark):
    import __spark_entry__ as entry

    out = entry.queries()["window_bot_users"](spark, SF_DIR).toPandas()
    # the stream input is the raw event log (no planted bots)
    return out[~out.user_id.str.startswith("b")].set_index("user_id")


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # TIME-ordered slices: the in-order delivery contract of the stateful
    # streams (dedup/transitions/funnel); boundary gaps straddle slices
    d = str(tmp_path_factory.mktemp("bot_in"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bounds = [r[0] for r in ev.select(
        F.percentile_approx("ts", [0.25, 0.5, 0.75], 10000).alias("p")
    ).select(F.explode("p")).collect()]
    lo = None
    parts = []
    for i, b in enumerate(bounds + [None]):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("ts") > lo)
        if b is not None:
            cond = cond & (F.col("ts") <= b)
        parts.append((i, cond))
        lo = b
    for i, cond in parts:
        ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/slice={i}"
        )
    return d


def _drain(spark, events_dir, name, max_files):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{events_dir}/slice=*")
    )
    q = (
        bot_stream(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    return pdf.groupby("user_id").tail(1).set_index("user_id")


@pytest.mark.parametrize("max_files,name", [(1, "bot_multi"), (16, "bot_one")])
def test_stream_equals_batch(spark, events_dir, batch, max_files, name):
    got = _drain(spark, events_dir, name, max_files)
    assert set(got.index) == set(batch.index)
    for uid in batch.index:
        for col in ("n_events", "n_gaps", "mean_gap_s", "dispersion_pm", "bot_flag"):
            assert got.loc[uid][col] == batch.loc[uid][col], (uid, col)
