"""Streaming sequence packing: budget invariants, cross-micro-batch
sequence continuation, stream-key equality with the batch op,
exactly-once resume."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import packing
from pdfextract_spark.streaming.pack_stream import start_pack_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pack_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    docs.select(F.col("doc_id").cast("string"), "text").repartition(
        10
    ).write.mode("overwrite").parquet(d)
    return d


def test_streaming_pack(spark, docs_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_pack_stream(spark, docs_dir, out, ckpt, max_files_per_trigger=2)
    q.awaitTermination(180)

    got = spark.read.parquet(out).toPandas()
    assert len(got) == 200
    assert got.doc_id.nunique() == 200

    # stream key and token cost match the batch op per doc
    batch = (
        packing.pack_sequences(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
                F.col("doc_id") < 200
            )
        )
        .toPandas()
        .set_index("doc_id")
    )
    st = got.set_index("doc_id")
    aligned = batch.loc[st.index]
    for col in ("stream", "n_tokens"):
        assert (st[col] == aligned[col]).all(), col

    # order-free packing invariants: budget respected (oversized docs
    # alone excepted), offsets are the running fill, sequences dense
    fills = got.groupby(["stream", "seq_id"]).n_tokens.agg(["sum", "count"])
    over = fills[fills["sum"] > packing.BUDGET]
    assert (over["count"] == 1).all()
    for (_, _), grp in got.groupby(["stream", "seq_id"]):
        grp = grp.sort_values("seq_offset")
        assert grp.seq_offset.iloc[0] == 0
        assert (
            grp.seq_offset.values[1:]
            == (grp.seq_offset + grp.n_tokens).values[:-1]
        ).all()
    for _, grp in got.groupby("stream"):
        assert sorted(grp.seq_id.unique()) == list(
            range(grp.seq_id.max() + 1)
        )
    # sequences continued across micro-batches (state carry)
    assert got.seq_id.max() > 0

    # exactly-once: re-draining with the same checkpoint adds nothing
    q2 = start_pack_stream(spark, docs_dir, out, ckpt, max_files_per_trigger=2)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 200
