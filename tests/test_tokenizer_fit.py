"""Tokenizer fit: fallback/fertility invariants and a hand-check corpus
where the merge inventory provably serves one language and not another."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import bpe

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fit(spark):
    import __spark_entry__ as entry

    return entry.queries()["text_tokenizer_fit"](spark, SF_DIR).toPandas()


def test_bounds(fit):
    assert (fit.n_fallback_words <= fit.n_words).all()
    assert (fit.fallback_pm <= 1000).all()
    # every word encodes to at least 1 and at most len(word)+1 symbols
    assert (fit.n_tokens_bpe >= fit.n_words).all()
    assert (fit.fertility_milli >= 1000).all()


def test_served_vs_unserved_language(spark):
    # 'aaaa bbbb' dominates: merges learn a/b pairs; the planted 'zq' docs
    # share no adjacent pair with the head, so every zq word falls back
    # 8 distinct high-count word shapes >> 8 merges: every merge round's
    # argmax pair has count >= 20, so none is spent on the count-4 zq pairs
    head_text = "aaaa bbbb cccc dddd eeee ffff gggg hhhh"
    rows = [(i, head_text) for i in range(20)]
    rows += [(100 + i, "zq qz zq qz") for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    enc = bpe.bpe_encode(docs)
    head = enc.filter(F.col("doc_id") < 100).agg(
        F.sum("n_tokens_bpe").alias("t"), F.sum("n_words").alias("w")
    ).collect()[0]
    tail = enc.filter(F.col("doc_id") >= 100).agg(
        F.sum("n_tokens_bpe").alias("t"), F.sum("n_words").alias("w")
    ).collect()[0]
    # head words compress below chars+1 = 5; tail words get NO merge and
    # stay at one symbol per char + EOW = exactly 3 tokens for 2 chars
    assert head.t / head.w < 5.0
    assert tail.t / tail.w == 3.0
