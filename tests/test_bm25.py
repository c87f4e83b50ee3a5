"""BM25 retrieval: planted-relevance ranking, salt-invariance of the
two-stage top-k (the skew strategy must be exact, not approximate), and
the mid-frequency term-selection gate."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.retrieval import BM25_MAXDF_MULT, bm25_topk

# 40 docs: "anchor point" planted in docs 0..8 (df = 9, the top
# mid-frequency bigram -> term 1 of query 0); doc 0 repeats it so tf
# dominates; docs 9..39 carry unique filler bigrams
ROWS = (
    [("0", "anchor point anchor point anchor point anchor point")]
    + [(str(i), f"u{i}a anchor point u{i}b") for i in range(1, 9)]
    + [(str(i), f"u{i}a u{i}b u{i}c") for i in range(9, 40)]
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id string, text string")


def test_planted_relevance(spark, corpus):
    out = bm25_topk(corpus).filter(F.col("query_id") == 0).collect()
    assert out, "query 0 must have candidates"
    by_rank = {r.rank: r for r in out}
    # the tf=4 doc outranks the tf=1 docs for the anchor-bigram query
    assert by_rank[1].doc_id == "0"
    assert by_rank[1].score_milli > by_rank[2].score_milli
    # every doc containing the anchor bigram is retrieved (9 anchors fit in
    # the top-10), and all of them rank ahead of any filler doc
    anchor_docs = {str(i) for i in range(0, 9)}
    retrieved = {r.doc_id for r in out}
    assert anchor_docs <= retrieved
    anchor_ranks = [r.rank for r in out if r.doc_id in anchor_docs]
    filler_ranks = [r.rank for r in out if r.doc_id not in anchor_docs]
    assert not filler_ranks or max(anchor_ranks) < min(filler_ranks)


def test_salt_invariance(spark, corpus):
    """Bucket-local top-k then global top-k is exact: any salt fan-out
    returns the identical ranking."""
    a = sorted(map(tuple, bm25_topk(corpus, salt=1).collect()))
    b = sorted(map(tuple, bm25_topk(corpus, salt=8).collect()))
    c = sorted(map(tuple, bm25_topk(corpus, salt=32).collect()))
    assert a == b == c
    assert a, "non-empty ranking"


def test_common_terms_excluded(spark):
    """A bigram in more than 1/BM25_MAXDF_MULT of docs never becomes a
    query term (its idf would floor at 0)."""
    rows = [(str(i), "stop word stop word") for i in range(30)] + [
        (str(i), f"u{i}a rare pair u{i}b") for i in range(30, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = bm25_topk(df).collect()
    # 'stop word' (df=30 of 40 > N/4) is excluded, so the stop-only docs
    # can match no query term and never appear
    stop_docs = {str(i) for i in range(30)}
    assert not ({r.doc_id for r in out} & stop_docs)
    assert out, "the rare bigrams still form a query"
    assert BM25_MAXDF_MULT * 30 > 40  # the planted df indeed violates the gate


def test_deterministic(spark, corpus):
    a = sorted(map(tuple, bm25_topk(corpus).collect()))
    b = sorted(map(tuple, bm25_topk(corpus).collect()))
    assert a == b


def test_bench_split_queries(spark):
    """bm25_bench_topk draws query terms from the benchmark split and ranks
    train docs: the planted-passage bigrams head the bench vocabulary
    (bench df = n_bench), survive the train-rarity gate, and retrieve the
    contaminated train docs; ranking stays salt-invariant."""
    from pdfextract_spark.functions import decontam
    from pdfextract_spark.functions.retrieval import bm25_bench_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bm25_bench_topk(docs).collect()
    assert out, "bench-derived queries retrieved nothing"
    # retrieved docs are train-side only
    split = {
        r.doc_id: (r.role, " " + decontam.PASSAGE in r.text2)
        for r in decontam.synthesize_eval_split(docs).collect()
    }
    for r in out:
        assert split[r.doc_id][0] == "train", r.doc_id
    # the passage queries surface planted (contaminated) train docs first:
    # for every query whose terms all come from the planted passage, the
    # full top-k is contaminated docs (later queries mix in bench-text
    # bigrams and legitimately retrieve clean docs)
    ws = decontam.PASSAGE.lower().split()
    passage_bigrams = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
    from pdfextract_spark.functions.retrieval import (
        BM25_TPQ,
        bm25_bench_terms,
    )
    terms = bm25_bench_terms(docs).collect()
    by_q = {}
    for t in terms:
        by_q.setdefault(t.query_id, []).append(t.token)
    pure = {q for q, toks in by_q.items() if set(toks) <= passage_bigrams}
    assert pure, "no all-passage query — premise too weak"
    hits = [r for r in out if r.query_id in pure]
    assert hits
    for r in hits:
        assert split[r.doc_id][1], f"doc {r.doc_id} in passage query not contaminated"
    # salt invariance (exactness of the two-stage top-k on this variant)
    a = sorted(map(tuple, out))
    b = sorted(map(tuple, bm25_bench_topk(docs, salt=32).collect()))
    assert a == b
