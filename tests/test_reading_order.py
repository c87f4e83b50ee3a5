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


def _is_ctrl(c):
    return c < " " or "\x7f" <= c <= "\x9f"


def _control_ratio(text):
    if not text:
        return 0.0
    return sum(1 for c in text if _is_ctrl(c)) / len(text)


def _in_words(spans):
    """Expected surviving words: garbled (bad-font) spans drop entirely (S8),
    control chars strip from the rest (S9), page numbers are out-of-stream."""
    words = []
    for s in spans:
        if s["kind"] != "text":
            continue
        if s["text"].isdigit() and len(s["text"]) <= 4:
            continue
        if _control_ratio(s["text"]) > 0.2:
            continue
        for w in s["text"].split():
            w2 = "".join(c for c in w if not _is_ctrl(c))
            if w2:
                words.append(w2)
    return words


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
