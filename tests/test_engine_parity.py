"""Vectorized engine vs sequential oracle: bit-exact span equality.

The Spark operator runs `engine.extract_document_fast`; the tests' source of
truth is `oracle.document.extract_document`. This test pins them together on
a corpus slice that exercises every code path: multi-page docs, media
interleaving, page numbers, titles, hyphen fragments, and one skewed ~100x
doc (fast-path fallbacks included).
"""

import pytest

from pdfextract_spark.corpus import generate, make_doc
from pdfextract_spark.engine import extract_document_fast
from pdfextract_spark.oracle.document import extract_document


def _args(doc_id, spans):
    return (
        doc_id,
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
        [s["offset"] for s in spans],
    )


def _tuples(result):
    return [(s.seq, s.kind, s.text, s.media_ref, s.offset) for s in result]


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_engine_matches_oracle(seed):
    for doc_id, spans in generate(60, seed=seed, skew_frac=0.0):
        exp = extract_document(*_args(doc_id, spans))
        got = extract_document_fast(*_args(doc_id, spans))
        assert _tuples(got) == _tuples(exp), doc_id


def test_engine_matches_oracle_skewed():
    doc_id, spans = make_doc(5, 123456, skew=True)
    exp = extract_document(*_args(doc_id, spans))
    got = extract_document_fast(*_args(doc_id, spans))
    assert _tuples(got) == _tuples(exp)


def test_engine_matches_oracle_edge_docs():
    cases = [
        ("empty", []),
        ("media_only", [
            {"kind": "media", "text": "", "media_ref": "img://m/0", "offset": 0},
        ]),
        ("one_word", [
            {"kind": "text", "text": "Hello", "media_ref": "", "offset": 0},
        ]),
        ("spaces", [
            {"kind": "text", "text": "  double  spaced  ", "media_ref": "", "offset": 0},
        ]),
        ("pagenum_only", [
            {"kind": "text", "text": "Title Here", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "7", "media_ref": "", "offset": 1},
        ]),
    ]
    for doc_id, spans in cases:
        exp = extract_document(*_args(doc_id, spans))
        got = extract_document_fast(*_args(doc_id, spans))
        assert _tuples(got) == _tuples(exp), doc_id
