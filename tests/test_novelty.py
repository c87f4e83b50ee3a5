"""Novelty score semantics: unique text scores ~1000, exact duplicates
score 0, mixed docs land in between, short docs are excluded (no
trigrams), and the lower-bound direction under collisions. Value parity
runs in the oracle suite (text_novelty)."""

import pytest

from pdfextract_spark.functions.textops import novelty_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unique_vs_duplicated(spark):
    rows = [
        (1, "wholly original prose that nobody else wrote anywhere today"),
        # 2 and 3 are identical -> every trigram shared -> novelty 0
        (2, "this exact boilerplate footer appears on every single page"),
        (3, "this exact boilerplate footer appears on every single page"),
    ]
    out = {r["doc_id"]: r for r in novelty_scores(_docs(spark, rows)).collect()}
    assert out["1"]["novel_pm"] == 1000
    assert out["2"]["novel_pm"] == 0
    assert out["3"]["novel_pm"] == 0


def test_mixed_document(spark):
    shared = "this exact boilerplate footer appears on every single page"
    rows = [
        (1, shared),
        (2, shared + " plus a genuinely novel closing sentence here"),
    ]
    out = {r["doc_id"]: r for r in novelty_scores(_docs(spark, rows)).collect()}
    assert 0 < out["2"]["novel_pm"] < 1000
    assert out["1"]["novel_pm"] == 0


def test_short_docs_excluded(spark):
    rows = [(1, "two words"), (2, "one"), (3, ""), (4, "three word doc")]
    out = {r["doc_id"]: r for r in novelty_scores(_docs(spark, rows)).collect()}
    assert set(out) == {"4"}
    assert out["4"]["n_grams"] == 1
    assert out["4"]["novel_pm"] == 1000


def test_within_doc_repetition_not_novel_theft(spark):
    # a trigram repeated only WITHIN one doc is still novel (g == c)
    rows = [(1, "echo echo echo echo echo")]
    out = novelty_scores(_docs(spark, rows)).collect()[0]
    assert out["n_grams"] == 3
    assert out["novel_pm"] == 1000


def test_deterministic(spark):
    rows = [(i, f"doc number {i} with some shared filler text body") for i in range(50)]
    a = [tuple(r) for r in novelty_scores(_docs(spark, rows)).collect()]
    b = [tuple(r) for r in novelty_scores(_docs(spark, rows)).collect()]
    assert a == b
