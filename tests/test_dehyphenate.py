"""S16 dehyphenation (TEI line-merge analog) over extracted spans."""

import pandas as pd

from pdfextract_spark.operators.postprocess import dehyphenate


def _run(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "seq", "kind", "text", "media_ref", "offset"]
    )
    out = dehyphenate(spark.createDataFrame(pdf)).toPandas()
    return list(out.sort_values(["doc_id", "seq"])[["seq", "kind", "text"]].itertuples(index=False, name=None))


def test_simple_merge(spark):
    rows = [
        ("d", 0, "text", "hyphen-", "", 0),
        ("d", 1, "text", "ated word", "", 1),
        ("d", 2, "text", "plain", "", 2),
    ]
    assert _run(spark, rows) == [(0, "text", "hyphenated word"), (2, "text", "plain")]


def test_chain_merge(spark):
    rows = [
        ("d", 0, "text", "a-", "", 0),
        ("d", 1, "text", "b-", "", 1),
        ("d", 2, "text", "c", "", 2),
        ("d", 3, "text", "tail", "", 3),
    ]
    assert _run(spark, rows) == [(0, "text", "abc"), (3, "text", "tail")]


def test_media_breaks_merge(spark):
    rows = [
        ("d", 0, "text", "broken-", "", 0),
        ("d", 1, "media", "", "img://d/0", 1),
        ("d", 2, "text", "after", "", 2),
    ]
    assert _run(spark, rows) == [
        (0, "text", "broken-"),
        (1, "media", ""),
        (2, "text", "after"),
    ]


def test_no_content_lost(spark):
    rows = [
        ("d", i, "text", f"w{i}-" if i % 2 == 0 else f"v{i}", "", i)
        for i in range(8)
    ]
    out = _run(spark, rows)
    joined = "".join(t for _, _, t in out).replace("-", "")
    orig = "".join(r[3] for r in rows).replace("-", "")
    assert joined == orig
