"""XML sinks (S15 .pxml / S16 TEI): ordering, escaping, role mapping."""

import pandas as pd
import pytest

from pdfextract_spark.operators.serialize import to_pxml, to_tei


@pytest.fixture(scope="module")
def spans_df(spark):
    rows = [
        ("d1", 0, "title", "A <Tale> & More", ""),
        ("d1", 1, "abstract", "short abstract", ""),
        ("d1", 2, "heading1", "1 Intro", ""),
        ("d1", 3, "text", "plain body", ""),
        ("d1", 4, "formula", "x = 1 + 2", ""),
        ("d1", 5, "media", "", "img://d1/fig0"),
        ("d1", 6, "footnote", "1 a note", ""),
        ("d2", 0, "text", "only body", ""),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, seq int, kind string, text string, media_ref string"
    )


def test_pxml(spans_df):
    out = {r["doc_id"]: r["pxml"] for r in to_pxml(spans_df).collect()}
    assert out["d1"].startswith('<document id="d1">')
    assert out["d1"].endswith("</document>")
    lines = out["d1"].splitlines()[1:-1]
    # reading order preserved, roles mapped, XML escaped
    assert lines[0] == "<line>A &lt;Tale&gt; &amp; More</line>"
    assert lines[4] == "<formula>x = 1 + 2</formula>"
    assert lines[5] == '<graphics ref="img://d1/fig0"/>'
    assert out["d2"] == '<document id="d2">\n<line>only body</line>\n</document>'


def test_tei(spans_df):
    out = {r["doc_id"]: r["tei"] for r in to_tei(spans_df).collect()}
    tei = out["d1"]
    assert "<titleStmt><title>A &lt;Tale&gt; &amp; More</title></titleStmt>" in tei
    body = tei.split("<body>\n")[1].split("\n</body>")[0].splitlines()
    assert body == [
        "<ab>short abstract</ab>",
        "<head>1 Intro</head>",
        "<p>plain body</p>",
        "<formula>x = 1 + 2</formula>",
        '<figure><graphic url="img://d1/fig0"/></figure>',
        '<note place="foot">1 a note</note>',
    ]
    # doc without a title gets an empty titleStmt
    assert "<title></title>" in out["d2"]
