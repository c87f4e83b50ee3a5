"""Streaming pHash: batch equality + exactly-once resume over the
synthesized media table (all three payload bands exercised in-stream)."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.multimodal import (
    media_payload_phash,
    media_table,
)
from pdfextract_spark.streaming.media_stream import start_phash_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("media_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 240
    )
    media_table(docs).coalesce(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch(spark, media_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_phash_stream(spark, media_dir, out, ckpt)
    q.awaitTermination(120)

    got = {r.media_ref: r for r in spark.read.parquet(out).collect()}
    want = {
        r.media_ref: r
        for r in media_payload_phash(
            spark.read.parquet(media_dir)
        ).collect()
    }
    assert set(got) == set(want) and len(got) == 60  # doc_id % 4 == 0
    for k in want:
        assert (got[k].doc_id, got[k].phash, got[k].src) == (
            want[k].doc_id,
            want[k].phash,
            want[k].src,
        )
    # header-only payloads take the loud stub path on this corpus whether
    # or not a codec is installed (codec decode fails on header-only bytes)
    assert all(r.src == "stub" for r in got.values())

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_phash_stream(spark, media_dir, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 60


def test_incremental_arrival(spark, media_dir, tmp_path):
    """A second micro-batch of NEW files hashes only the new payloads."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_phash_stream(spark, media_dir, out, ckpt)
    q.awaitTermination(120)
    n0 = spark.read.parquet(out).count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        (F.col("doc_id") >= 240) & (F.col("doc_id") < 360)
    )
    media_table(docs).coalesce(2).write.mode("append").parquet(media_dir)

    q2 = start_phash_stream(spark, media_dir, out, ckpt)
    q2.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n0 == 60 and n1 == 90  # 30 new media docs in [240, 360)
    # no duplicate hashing of the original payloads
    dups = (
        spark.read.parquet(out)
        .groupBy("media_ref")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0
