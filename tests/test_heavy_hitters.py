"""Count-min heavy hitters: exactness vs the naive vocabulary census (the
CMS-never-undercounts completeness argument made empirical), planted heavy
token recall, overestimate direction, and the bounded census geometry.
Value-level DuckDB parity runs in the parametrized oracle suite
(sketch_heavy_hitters)."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.sketches import (
    CMS_D,
    CMS_W,
    HH_PERMILLE,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # zipf-ish synthetic corpus: token t_k appears ~N/k times, plus one
    # planted token far above the threshold
    rows = []
    for doc in range(120):
        words = []
        for k in range(1, 40):
            if doc % k == 0:
                words.append(f"t{k}")
        if doc % 2 == 0:
            words.append("PLANTED")
        rows.append((doc, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive(spark, corpus):
    toks = corpus.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    total = toks.count()
    thr = max(1, (HH_PERMILLE * total) // 1000)
    census = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return {
        r["token"]: r["n"] for r in census.filter(F.col("n") >= thr).collect()
    }


def test_matches_naive_exactly(spark, corpus):
    got = {r["token"]: r["n"] for r in heavy_hitters(corpus).collect()}
    want = _naive(spark, corpus)
    assert got == want
    assert "planted" in got  # lowercased by the tokenizer


def test_cms_never_undercounts(corpus):
    for r in heavy_hitters(corpus).collect():
        assert r["cms_est"] >= r["n"]


def test_census_is_bounded(corpus):
    # the candidate census the operator is built on: d*w cells, full stop
    assert CMS_D * CMS_W == 2048
    out = heavy_hitters(corpus)
    # output key space bounded by total/threshold: with HH_PERMILLE=2 at
    # most 500 heavy hitters can exist
    assert out.count() <= 1000 // HH_PERMILLE


def test_deterministic_order(corpus):
    a = [tuple(r) for r in heavy_hitters(corpus).collect()]
    b = [tuple(r) for r in heavy_hitters(corpus).collect()]
    assert a == b
    ns = [r[2] for r in a]
    assert ns == sorted(ns, reverse=True)
