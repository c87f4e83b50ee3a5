"""Streaming gate-agreement: exact batch equality under any micro-batch
partition and arrival order (confusion counts merge by addition), and the
kappa recomputed from drained bucket sums equals the batch kappa_milli."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.streaming.gate_stream import gate_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_row(spark):
    from pdfextract_spark.functions.textops import gate_agreement

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return gate_agreement(docs).toPandas().iloc[0]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    # slices deliberately NOT in doc_id order: arrival order must not matter
    d = str(tmp_path_factory.mktemp("gate_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for i, m in enumerate([2, 0, 3, 1]):
        docs.filter(F.col("doc_id") % 4 == m).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/slice={i}")
    return d


def _drain(spark, docs_dir, name, max_files):
    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{docs_dir}/slice=*")
    )
    q = (
        gate_stream(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    final = pdf.groupby("bucket").tail(1)
    return (
        int(final.both_keep.sum()),
        int(final.rule_only.sum()),
        int(final.clf_only.sum()),
        int(final.both_drop.sum()),
    )


def _expect(batch_row):
    return (
        int(batch_row.both_keep),
        int(batch_row.rule_only),
        int(batch_row.clf_only),
        int(batch_row.both_drop),
    )


def test_stream_equals_batch_multi_microbatch(spark, docs_dir, batch_row):
    assert _drain(spark, docs_dir, "gate_multi", 1) == _expect(batch_row)


def test_stream_equals_batch_single_microbatch(spark, docs_dir, batch_row):
    assert _drain(spark, docs_dir, "gate_single", 16) == _expect(batch_row)


def test_kappa_from_drained_cells(spark, docs_dir, batch_row):
    a, b, c, d = _drain(spark, docs_dir, "gate_kappa", 2)
    n = a + b + c + d
    pe = (a + b) * (a + c) + (c + d) * (b + d)
    den = n * n - pe
    kappa = 1000 if den == 0 else int((1000 * (n * (a + d) - pe)) / den)
    assert kappa == int(batch_row.kappa_milli)
