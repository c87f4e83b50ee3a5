"""Streaming hygiene (PII redact + quality gates): batch equality +
exactly-once resume. The input is the synthesized PII-bearing web corpus,
so every redaction branch fires in-stream."""

import re

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import webclean
from pdfextract_spark.streaming.hygiene_stream import (
    hygiene_columns,
    start_hygiene_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hyg_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    web = webclean.synthesize_web(docs).select(
        "doc_id", F.col("web_text").alias("text")
    )
    # plant stage-0 signal too: mojibake/dead-bytes (doc_id%5 / %7 / %11
    # schedule) and badwords (%13 / %23) so the encoding and blocklist
    # branches fire in-stream
    enc = webclean.synthesize_encoding(web).select(
        "doc_id", F.col("enc_text").alias("text")
    )
    webclean.synthesize_badwords(enc).select(
        "doc_id", F.col("bw_text").alias("text")
    ).coalesce(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch_and_redacts(spark, docs_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_hygiene_stream(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id: r
        for r in hygiene_columns(spark.read.parquet(docs_dir)).collect()
    }
    assert set(got) == set(want) and len(got) == 60
    for k in want:
        assert (
            got[k].text, got[k].pii_found, got[k].ok_quality,
            got[k].enc_bad, got[k].has_badword,
        ) == (
            want[k].text, want[k].pii_found, want[k].ok_quality,
            want[k].enc_bad, want[k].has_badword,
        )
    # redaction actually fired in-stream and scrubbed every pattern
    assert sum(r.pii_found for r in got.values()) > 0
    # stage-0 branches fired: badwords flagged, mojibake repaired in-stream
    assert any(r.has_badword for r in got.values())
    assert any("café" in r.text for r in got.values())
    assert not any("Ã©" in r.text or "�" in r.text for r in got.values())
    for pat in (webclean.RE_EMAIL, webclean.RE_URL, webclean.RE_IPV4, webclean.RE_PHONE):
        assert not any(re.search(pat, r.text) for r in got.values()), pat

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_hygiene_stream(spark, docs_dir, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 60
