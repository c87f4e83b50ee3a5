"""HTML metadata extraction: known synthesis structure is recovered."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def meta(spark):
    return entry.queries()["html_meta"](spark, SF_DIR).toPandas()


def test_title_and_h1_recovered(meta):
    for _, r in meta.iterrows():
        assert r.title == f"doc {r.doc_id}"
        assert r.h1 == f"document {r.doc_id}"


def test_counts_match_synthesis_schedule(spark, meta):
    # nav links k in [3,6], sidebar j in [2,4], footer always 2 anchors,
    # cookie/sharebar chrome may add; comments m in [0,2]
    assert (meta.n_comments <= 2).all()
    assert (meta.n_links >= 5).all()  # k>=3 nav + j>=2 related
    # n_paragraphs counts only bare <p> article chunks: the comment paras
    # use <p class="comment">, which the bare pattern does not match
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    words = docs.set_index(docs.doc_id.astype(str)).text.str.split(" ").map(len)
    import math

    from pdfextract_spark.functions.htmlops import PARA_WORDS

    for _, r in meta.iterrows():
        expect = math.ceil(words[r.doc_id] / PARA_WORDS)
        assert r.n_paragraphs == expect
