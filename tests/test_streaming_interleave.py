"""Streaming interleave gates: batch equality + exactly-once resume over
the rich interleaved corpus (media runs/fractions exercised in-stream)."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.multimodal import interleave_stats
from pdfextract_spark.sources.adapters import documents_to_interleaved_rich
from pdfextract_spark.streaming.interleave_stream import (
    start_interleave_gate_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spans_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inter_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    documents_to_interleaved_rich(docs).coalesce(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_matches_batch(spark, spans_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_interleave_gate_stream(spark, spans_dir, out, ckpt)
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id: r
        for r in interleave_stats(spark.read.parquet(spans_dir)).collect()
    }
    assert set(got) == set(want) and len(got) == 60
    for k in want:
        g, w = got[k], want[k]
        assert (
            g.n_spans, g.n_text_spans, g.n_media_spans, g.n_text_chars,
            g.max_media_run, g.media_per_mille, g.keep_doc,
        ) == (
            w.n_spans, w.n_text_spans, w.n_media_spans, w.n_text_chars,
            w.max_media_run, w.media_per_mille, w.keep_doc,
        )
    # the schedule exercises both gate outcomes in-stream
    assert any(r.keep_doc for r in got.values())
    assert any(not r.keep_doc for r in got.values())

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_interleave_gate_stream(spark, spans_dir, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 60


def test_chunk_stream_matches_batch(spark, spans_dir, tmp_path):
    from pdfextract_spark.functions.packing import chunk_interleaved
    from pdfextract_spark.streaming.interleave_stream import start_chunk_stream

    out = str(tmp_path / "cout")
    ckpt = str(tmp_path / "cckpt")
    q = start_chunk_stream(spark, spans_dir, out, ckpt)
    q.awaitTermination(120)

    key = lambda r: (r.doc_id, r.span_offset)
    got = {key(r): r for r in spark.read.parquet(out).collect()}
    want = {
        key(r): r
        for r in chunk_interleaved(spark.read.parquet(spans_dir)).collect()
    }
    assert set(got) == set(want) and len(got) > 60
    for k in want:
        assert (got[k].kind, got[k].cost, got[k].chunk_id) == (
            want[k].kind, want[k].cost, want[k].chunk_id
        )
    # multi-chunk docs actually occurred in-stream
    assert any(r.chunk_id > 0 for r in got.values())

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_chunk_stream(spark, spans_dir, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(want)


def test_caption_stream_matches_batch(spark, spans_dir, tmp_path):
    from pdfextract_spark.functions.multimodal import caption_pairs
    from pdfextract_spark.streaming.interleave_stream import start_caption_stream

    out = str(tmp_path / "capout")
    ckpt = str(tmp_path / "capckpt")
    q = start_caption_stream(spark, spans_dir, out, ckpt)
    q.awaitTermination(120)

    key = lambda r: (r.doc_id, r.media_ref)
    got = {key(r): r for r in spark.read.parquet(out).collect()}
    want = {
        key(r): r
        for r in caption_pairs(spark.read.parquet(spans_dir)).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k in want:
        g, w = got[k], want[k]
        assert (
            g.media_offset, g.caption_side, g.caption_dist, g.caption, g.pair_ok
        ) == (
            w.media_offset, w.caption_side, w.caption_dist, w.caption, w.pair_ok
        )
    # both caption sides occur in-stream under the rich schedule
    sides = {r.caption_side for r in got.values()}
    assert "prev" in sides and "next" in sides

    # exactly-once: draining again with the same checkpoint adds nothing
    n = spark.read.parquet(out).count()
    q2 = start_caption_stream(spark, spans_dir, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == n
