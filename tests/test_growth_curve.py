"""Growth curve: cumulative identities and direct-recompute of two prefixes."""

import hashlib

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curve(spark):
    return (
        entry.queries()["corpus_growth_curve"](spark, SF_DIR)
        .toPandas()
        .sort_values("prefix_eighths")
    )


def test_cumulative_identities(spark, curve):
    assert list(curve.prefix_eighths) == list(range(1, 9))
    assert curve.n_distinct_tokens.is_monotonic_increasing
    assert curve.n_docs.is_monotonic_increasing
    assert int(curve.new_tokens.sum()) == int(curve.n_distinct_tokens.iloc[-1])
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert int(curve.n_docs.iloc[-1]) == total


def test_direct_recompute_prefixes(spark, curve):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    buck = docs.doc_id.astype(str).map(
        lambda d: int(hashlib.md5(f"gr|{d}".encode()).hexdigest()[:4], 16) % 8
    )
    for k in (0, 3, 7):
        sub = docs[buck <= k]
        vocab = set()
        for t in sub.text:
            vocab.update(w for w in t.lower().split(" ") if w)
        row = curve[curve.prefix_eighths == k + 1].iloc[0]
        assert int(row.n_distinct_tokens) == len(vocab)
        assert int(row.n_docs) == len(sub)
