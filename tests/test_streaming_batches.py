"""Streaming length-bucketed batching: geometry equality with the batch
op, arrival-order fill across micro-batches, padding bound, exactly-once
resume."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import packing
from pdfextract_spark.streaming.batch_stream import start_length_bucket_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lb_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    docs.select(F.col("doc_id").cast("string"), "text").repartition(
        10
    ).write.mode("overwrite").parquet(d)
    return d


def test_streaming_batches(spark, docs_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_length_bucket_stream(
        spark, docs_dir, out, ckpt, max_files_per_trigger=2
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).toPandas()
    # every input doc assigned exactly once
    assert len(got) == 200
    assert got.doc_id.nunique() == 200

    # geometry equality: n_tokens / bucket / stream per doc match the
    # batch op bit-for-bit (only fill ORDER may differ)
    batch = (
        packing.length_bucket_batches(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
                F.col("doc_id") < 200
            )
        )
        .toPandas()
        .set_index("doc_id")
    )
    st = got.set_index("doc_id")
    aligned = batch.loc[st.index]
    for col in ("n_tokens", "bucket", "stream"):
        assert (st[col] == aligned[col]).all(), col

    # the order-free padding bound: every batch's length spread < 2x
    for (_, _, _), grp in got.groupby(["bucket", "stream", "batch_id"]):
        assert grp.n_tokens.max() < 2 * max(1, grp.n_tokens.min())

    # arrival-order fill: positions dense per (bucket, stream) — batch ids
    # contiguous from 0, slots dense within each closed batch
    for (_, _), grp in got.groupby(["bucket", "stream"]):
        pos = sorted(grp.batch_id * packing.BATCH_SIZE + grp.slot)
        assert pos == list(range(len(grp)))
    # multi-micro-batch state carry actually happened: some (bucket,
    # stream) spans more than one batch_id
    assert got.batch_id.max() > 0

    # exactly-once: re-draining with the same checkpoint adds nothing
    q2 = start_length_bucket_stream(
        spark, docs_dir, out, ckpt, max_files_per_trigger=2
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 200
