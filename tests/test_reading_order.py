"""Reading-order recovery: column detection must reconstruct the input word
order from pure geometry.

The tokenizer flows ~25% of docs in two columns (left fills first). The
engine sees only positioned glyphs; recovering the original span order
requires finding the column boundary (P3-P5) and ordering regions
left-to-right (B6). Page-number spans are excluded (they are pinned to the
page bottom by the tokenizer, intentionally out of stream order)."""

import pytest

from pdfextract_spark.corpus import generate
from pdfextract_spark.engine import extract_document_fast
from pdfextract_spark.oracle.document import extract_document


def _in_words(spans):
    return [
        w
        for s in spans
        if s["kind"] == "text" and not (s["text"].isdigit() and len(s["text"]) <= 4)
        for w in s["text"].split()
    ]


TEXT_KINDS = ("text", "title", "abstract", "footnote", "heading1", "heading2", "heading3")


def _out_words(result):
    return [
        w
        for s in result
        if s.kind in TEXT_KINDS
        and not (s.text.replace(" ", "").isdigit() and len(s.text.replace(" ", "")) <= 4)
        for w in s.text.split()
    ]


@pytest.mark.parametrize("seed", [5, 21, 101])
def test_oracle_recovers_reading_order(seed):
    for doc_id, spans in generate(40, seed=seed, skew_frac=0.0):
        out = extract_document(
            doc_id,
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        assert _in_words(spans) == _out_words(out), doc_id


def test_engine_recovers_reading_order():
    for doc_id, spans in generate(40, seed=33, skew_frac=0.0):
        out = extract_document_fast(
            doc_id,
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        assert _in_words(spans) == _out_words(out), doc_id
