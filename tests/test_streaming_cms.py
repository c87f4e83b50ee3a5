"""Streaming count-min census: exact batch equality under ANY micro-batch
partition and arrival order (add-merge is associative + commutative),
including a shuffled-slice run, plus the live hot-flag contract."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.sketches import (
    CMS_D,
    CMS_W,
    HH_PERMILLE,
    _cms_bucket,
)
from pdfextract_spark.streaming.cms_stream import cms_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_census(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_bucket(F.col("token"), i).cast("int").alias("b"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.b")
    census = cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c"))
    return {(r["r"], r["b"]): r["c"] for r in census.collect()}


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    # slices deliberately NOT in doc_id order: arrival order must not matter
    d = str(tmp_path_factory.mktemp("cms_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    order = [3, 1, 0, 2]
    for i, m in enumerate(order):
        docs.filter(F.col("doc_id") % 4 == m).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/slice={i}")
    return d


def _run(spark, docs_dir, name, max_files):
    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{docs_dir}/slice=*")
    )
    q = (
        cms_stream(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    # update mode: one census emission per (row, micro-batch); last wins
    final = pdf.groupby(["r", "b"]).tail(1)
    return final


def test_stream_equals_batch_multi_microbatch(spark, docs_dir, batch_census):
    final = _run(spark, docs_dir, "cms_multi", 1)
    got = {(r.r, r.b): r.c for r in final.itertuples()}
    assert got == batch_census


def test_stream_equals_batch_single_microbatch(spark, docs_dir, batch_census):
    final = _run(spark, docs_dir, "cms_single", 16)
    got = {(r.r, r.b): r.c for r in final.itertuples()}
    assert got == batch_census


def test_hot_flag_and_totals(spark, docs_dir, batch_census):
    final = _run(spark, docs_dir, "cms_hot", 2)
    total = sum(c for (r, _), c in batch_census.items() if r == 0)
    thr = max(1, (HH_PERMILLE * total) // 1000)
    for row in final.itertuples():
        assert row.row_total == total
        assert row.hot == (row.c >= thr)
        assert 0 <= row.b < CMS_W and 0 <= row.r < CMS_D
