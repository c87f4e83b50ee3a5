"""Streaming HTML strip: batch equality + exactly-once resume. The pages are
the same deterministic chrome-laden corpus the batch gate uses, so the
stream's output must equal documents.text exactly."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.htmlops import synthesize_html
from pdfextract_spark.streaming import start_html_strip_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    synthesize_html(docs).select(
        F.col("doc_id").cast("string").alias("doc_id"), "html"
    ).coalesce(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_strip_matches_batch(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_html_strip_stream(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["main_text"] for r in spark.read.parquet(out).collect()
    }
    want = {
        str(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .collect()
    }
    assert got == want

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_html_strip_stream(spark, pages_dir, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(want)
