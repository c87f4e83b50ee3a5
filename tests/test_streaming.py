"""Streaming ingestion wrapper: same extraction, micro-batch harness,
exactly-once resume from the stream checkpoint."""

import os

import pytest

from pdfextract_spark.corpus import generate
from pdfextract_spark.engine import extract_document_fast
from pdfextract_spark.streaming import start_extract_stream

N_DOCS = 12


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    rows = []
    for doc_id, spans in generate(N_DOCS, seed=7, skew_frac=0.0):
        rows.append((doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]))
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    df.coalesce(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch_oracle(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_stream(spark, input_dir, out, ckpt)
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["seq"]): (r["kind"], r["text"], r["media_ref"])
        for r in spark.read.parquet(out).collect()
    }
    n_docs = 0
    for doc_id, spans in generate(N_DOCS, seed=7, skew_frac=0.0):
        n_docs += 1
        expected = extract_document_fast(
            doc_id,
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        for sp in expected:
            assert got[(doc_id, sp.seq)] == (sp.kind, sp.text, sp.media_ref), doc_id
    assert len({k[0] for k in got}) == n_docs

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_extract_stream(spark, input_dir, out, ckpt)
    q2.awaitTermination(60)
    again = spark.read.parquet(out).count()
    assert again == len(got)
