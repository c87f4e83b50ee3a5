"""VERBOSE word-box contracts (round-4): the writeWord analog
(SimpleXMLOutput.java:103-134, 226-242, writeRectangle :187-193).

- engine == oracle on the per-word (value, style_ref, x, y, w, h) payload,
  including caption lines (whose geometry is carried by value);
- the page-parallel operator ships caption word payloads through its packed
  rows and emits byte-identical words to the narrow path (skew docs incl.);
- to_pxml_words renders them (line box = union of word boxes, formula lines
  stay wordless like the reference's writeLine formula branch).
"""

import pytest

from pdfextract_spark.corpus import generate
from pdfextract_spark.engine import extract_document_fast
from pdfextract_spark.operators.extract import extract_spans
from pdfextract_spark.operators.extract_paged import extract_spans_paged
from pdfextract_spark.oracle.document import extract_document

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _args(doc_id, spans):
    return (
        doc_id,
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
        [int(s["offset"]) for s in spans],
    )


def test_engine_words_match_oracle():
    n_caption_lines = 0
    for doc_id, spans in generate(24, seed=77):
        exp = extract_document(*_args(doc_id, spans), emit_words=True)
        got = extract_document_fast(*_args(doc_id, spans), emit_words=True)
        assert [(s.seq, s.words) for s in got] == [(s.seq, s.words) for s in exp], doc_id
        for s in exp:
            if s.kind == "media":
                assert s.words == ()
            else:
                assert s.words, (doc_id, s)
                # every word's box must be inside-ish the line's text order
                assert " ".join(w[0] for w in s.words) == s.text
        # caption lines (text spans re-attached after media) carry words too
        n_caption_lines += sum(
            1 for s in exp if s.kind == "text" and s.para >= 1_000_000
        )
    assert n_caption_lines > 0, "corpus exercised no caption lines"


def test_words_default_off():
    for doc_id, spans in generate(4, seed=78):
        out = extract_document_fast(*_args(doc_id, spans))
        assert all(s.words == () for s in out)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = []
    for doc_id, spans in generate(12, seed=79, skew_frac=0.25):
        rows.append(
            (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        )
    return spark.createDataFrame(rows, SCHEMA)


def _words_key(df):
    return {
        (r["doc_id"], r["seq"]): tuple(
            (w["value"], w["style_ref"], w["x"], w["y"], w["w"], w["h"])
            for w in (r["words"] or [])
        )
        for r in df.collect()
    }


def test_paged_words_equal_narrow(spark, docs_df):
    narrow = _words_key(extract_spans(docs_df, with_words=True))
    paged = _words_key(
        extract_spans_paged(docs_df, page_partitions=8, with_words=True)
    )
    assert set(narrow) == set(paged)
    diffs = [(k, narrow[k], paged[k]) for k in narrow if narrow[k] != paged[k]]
    assert not diffs, diffs[:3]


def test_pxml_words_rendering(spark, docs_df):
    from pdfextract_spark.operators.serialize import to_pxml_words

    out = to_pxml_words(extract_spans(docs_df, with_words=True)).collect()
    assert len(out) == 12
    joined = "\n".join(r["pxml"] for r in out)
    assert "<word value=" in joined
    # line boxes are integers and lines carry boxes in verbose mode
    import re

    m = re.search(r'<line styleRef="\d+" x="(-?\d+)" y="(-?\d+)" w="(-?\d+)" h="(-?\d+)">', joined)
    assert m, "no verbose line element rendered"
    # formula lines never have word children (reference writeLine branch)
    assert not re.search(r"<formula>[^<]*<word", joined)
