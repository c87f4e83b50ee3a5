"""Dirty-input robustness: at 10^12 documents every malformation exists.
The extraction operator must never fail a task — broken documents become
quarantine rows (kind='error'), everything else extracts normally."""

import pytest

from pdfextract_spark.operators.extract import extract_spans

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], []).append((r["seq"], r["kind"], r["text"]))
    return out


def test_degenerate_documents_never_fail_the_task(spark):
    rows = [
        ("good", [("text", "a perfectly normal document body", "", 0)]),
        ("empty_spans", []),
        ("null_spans", None),
        ("null_text", [("text", None, "", 0)]),
        ("empty_text", [("text", "", "", 0)]),
        ("media_only", [("media", "", "img://x/0", 0)]),
        ("dup_offsets", [("text", "first span", "", 3), ("text", "second span", "", 3)]),
        ("negative_offset", [("text", "negative offset", "", -7)]),
        ("whitespace_text", [("text", "   ", "", 0)]),
        ("unknown_kind", [("wat", "ignored kind", "", 0)]),
    ]
    out = _collect(extract_spans(_rows(spark, rows)))

    # the good doc extracts; no doc produced an error row that crashed others
    assert any(k == "text" for _, k, _ in out["good"])
    errors = {d for d, spans in out.items() if any(k == "error" for _, k, _ in spans)}
    # degenerate docs either produce spans, nothing, or a quarantine row —
    # but NEVER raise out of the task (this test completing proves that)
    assert "good" not in errors
    # media-only doc must preserve its media span
    assert ("media" in {k for _, k, _ in out.get("media_only", [])})
    # duplicate offsets: both spans' words survive
    dup_text = " ".join(t for _, k, t in sorted(out["dup_offsets"]) if k != "error")
    assert "first" in dup_text and "second" in dup_text


def test_huge_span_count_doc_extracts(spark):
    spans = [("text", f"word{i} filler body text", "", i) for i in range(3000)]
    out = _collect(extract_spans(_rows(spark, [("huge", spans)])))
    kinds = {k for _, k, _ in out["huge"]}
    assert "error" not in kinds
    assert sum(1 for _, k, _ in out["huge"] if k != "media") > 1000
