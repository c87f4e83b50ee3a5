"""Page-parallel extraction must produce byte-identical output to the
narrow per-document operator — including on oversized (skew) documents,
which are its reason to exist."""

import pytest

from pdfextract_spark.corpus import generate
from pdfextract_spark.operators.extract import extract_spans
from pdfextract_spark.operators.extract_paged import extract_spans_paged

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = []
    for doc_id, spans in generate(16, seed=55, skew_frac=0.25):  # 4 skew docs
        rows.append(
            (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        )
    return spark.createDataFrame(rows, SCHEMA)


def _key(df):
    return {
        (r["doc_id"], r["seq"]): (r["kind"], r["text"], r["media_ref"], r["offset"])
        for r in df.collect()
    }


def test_paged_equals_narrow(spark, docs_df):
    narrow = _key(extract_spans(docs_df))
    paged = _key(extract_spans_paged(docs_df, page_partitions=12))
    assert set(narrow) == set(paged)
    diffs = [(k, narrow[k], paged[k]) for k in narrow if narrow[k] != paged[k]]
    assert not diffs, diffs[:5]
