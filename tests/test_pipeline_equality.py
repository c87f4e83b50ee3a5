"""Span-sequence equality: Spark pipeline vs the sequential oracle.

The FIXTURES.md §4 contract: for every document, the engine's ordered
sequence of (kind, text, media_ref) must equal the oracle's exactly; offsets
non-decreasing-ish and drawn from input offsets; conservation and media
preservation invariants hold.
"""

import os

import pandas as pd
import pytest

from pdfextract_spark.corpus import as_pandas, generate, make_doc
from pdfextract_spark.operators.extract import extract_batch, extract_spans
from pdfextract_spark.oracle.document import extract_document

N_DOCS = 80


def _oracle_spans(doc_id, spans):
    return extract_document(
        doc_id,
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
        [s["offset"] for s in spans],
    )


@pytest.fixture(scope="module")
def corpus_pdf():
    # include one skewed doc to exercise big span arrays
    pdf = as_pandas(N_DOCS, seed=7, skew_frac=0.0)
    big_id, big_spans = make_doc(7, 10_000, skew=True)
    pdf.loc[len(pdf)] = {"doc_id": big_id, "spans": big_spans}
    return pdf


def test_spark_matches_oracle(spark, corpus_pdf):
    sdf = spark.createDataFrame(corpus_pdf)
    result = extract_spans(sdf, num_partitions=8).toPandas()

    by_doc = {d: g.sort_values("seq") for d, g in result.groupby("doc_id")}
    assert set(by_doc) == set(corpus_pdf["doc_id"])

    for _, row in corpus_pdf.iterrows():
        expected = _oracle_spans(row["doc_id"], row["spans"])
        got = by_doc[row["doc_id"]]
        assert list(got["seq"]) == list(range(len(expected))), row["doc_id"]
        exp_tuples = [(s.kind, s.text, s.media_ref) for s in expected]
        got_tuples = list(zip(got["kind"], got["text"], got["media_ref"]))
        assert got_tuples == exp_tuples, row["doc_id"]
        # offsets drawn from input offsets
        in_offsets = {s["offset"] for s in row["spans"]}
        assert set(got["offset"]).issubset(in_offsets)


def test_determinism_two_parallelism_levels(spark, corpus_pdf):
    sdf = spark.createDataFrame(corpus_pdf)
    a = extract_spans(sdf, num_partitions=2).toPandas()
    b = extract_spans(sdf, num_partitions=8).toPandas()
    key = ["doc_id", "seq"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_conservation_invariants():
    """Every input media ref appears exactly once; every non-pagenum text
    span's non-space chars appear in the output."""
    for doc_id, spans in generate(30, seed=11, skew_frac=0.0):
        out = _oracle_spans(doc_id, spans)
        in_refs = sorted(s["media_ref"] for s in spans if s["kind"] == "media")
        out_refs = sorted(s.media_ref for s in out if s.kind == "media")
        assert in_refs == out_refs, doc_id

        def is_ctrl(c):
            return c < " " or "\x7f" <= c <= "\x9f"

        def clean_len(text):
            return sum(1 for c in text if c != " " and not is_ctrl(c))

        def ctrl_ratio(text):
            return (sum(1 for c in text if is_ctrl(c)) / len(text)) if text else 0.0

        out_text = "".join(s.text for s in out).replace(" ", "")
        # garbled (bad-font) spans are dropped whole (S8); control chars are
        # stripped from the rest (S9); page numbers may be removed (L3)
        in_chars = sum(
            clean_len(s["text"])
            for s in spans
            if s["kind"] == "text" and ctrl_ratio(s["text"]) <= 0.2
        )
        removed = sum(
            len(s["text"]) for s in spans
            if s["kind"] == "text" and s["text"].isdigit() and len(s["text"]) <= 4
        )
        assert len(out_text) >= in_chars - removed, doc_id
        assert len(out_text) <= in_chars, doc_id


def test_quarantine_on_bad_doc(spark):
    # a doc with a None spans entry triggers the per-doc error path
    pdf = pd.DataFrame(
        [
            {"doc_id": "good", "spans": [
                {"kind": "text", "text": "Hello World Title", "media_ref": "", "offset": 0},
                {"kind": "text", "text": "body text line here", "media_ref": "", "offset": 1},
            ]},
            {"doc_id": "bad", "spans": [
                {"kind": "text", "text": None, "media_ref": None, "offset": None},
            ]},
        ]
    )
    sdf = spark.createDataFrame(pdf)
    out = extract_spans(sdf).toPandas()
    good = out[out.doc_id == "good"]
    assert len(good) > 0 and (good.kind != "error").all()
    bad = out[out.doc_id == "bad"]
    # either extracted benignly or quarantined as a single error row — never a task failure
    assert len(bad) >= 0
