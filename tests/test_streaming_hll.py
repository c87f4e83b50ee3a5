"""Streaming HLL: exact batch equality under ANY micro-batch partition and
arrival order (max-merge is associative + commutative), including a
shuffled-slice run — the property the sketch exists for."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.sketches import hll_host_distinct
from pdfextract_spark.streaming.hll_stream import hll_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_sketch(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {
        r["host"]: (r["n_regs"], r["zeros"], r["hll_raw"], r["hll_est"])
        for r in hll_host_distinct(docs).collect()
    }


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    # slices deliberately NOT in doc_id order: arrival order must not matter
    d = str(tmp_path_factory.mktemp("hll_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    order = [2, 0, 3, 1]
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
        hll_stream(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one row per (host, micro-batch); last write wins
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    final = pdf.groupby("host").tail(1)
    return {
        r.host: (r.n_regs, r.zeros, r.hll_raw, r.hll_est)
        for r in final.itertuples()
    }


def test_stream_equals_batch_multi_microbatch(spark, docs_dir, batch_sketch):
    got = _run(spark, docs_dir, "hll_multi", 1)
    assert got == batch_sketch


def test_stream_equals_batch_single_microbatch(spark, docs_dir, batch_sketch):
    got = _run(spark, docs_dir, "hll_single", 16)
    assert got == batch_sketch
