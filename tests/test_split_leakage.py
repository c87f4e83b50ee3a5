"""Leakage-safe splitting: a planted near-dup pair whose doc ids hash to
DIFFERENT splits under naive per-doc keying must land in the SAME split
under group keying — the exact leak the operator exists to prevent."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.curation import (
    SPLIT_TRAIN_PM,
    SPLIT_VAL_PM,
    leakage_safe_split,
    split_leakage_audit,
)

DUP_TEXT = " ".join(f"tok{i % 7} word{i % 11}" for i in range(40))


def _pm(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 1000


def _find_ids():
    """One id in the train band, one in the test band (naive keying would
    put the planted near-dups on opposite sides of the eval boundary)."""
    train_id = test_id = None
    for i in range(5000):
        s = str(i)
        if train_id is None and _pm(s) < SPLIT_TRAIN_PM:
            train_id = s
        if test_id is None and _pm(s) >= SPLIT_VAL_PM:
            test_id = s
        if train_id and test_id:
            return train_id, test_id
    raise AssertionError("band search failed")


@pytest.fixture(scope="module")
def corpus(spark):
    train_id, test_id = _find_ids()
    rows = [(train_id, DUP_TEXT), (test_id, DUP_TEXT)] + [
        (str(10000 + i), f"unique{i}a unique{i}b unique{i}c unique{i}d " * 10)
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string"), train_id, test_id


def test_near_dups_share_split(spark, corpus):
    df, train_id, test_id = corpus
    out = {r.doc_id: r for r in leakage_safe_split(df).collect()}
    assert len(out) == 32
    a, b = out[train_id], out[test_id]
    # identical texts -> identical signatures -> LSH pair -> one component
    assert a.group_key == b.group_key == min(train_id, test_id)
    assert a.split == b.split
    # naive keying would have split them (that's why these ids were chosen)
    assert _pm(train_id) < SPLIT_TRAIN_PM <= SPLIT_VAL_PM <= _pm(test_id)


def test_audit_counts_prevented_leak(spark, corpus):
    df, _, _ = corpus
    m = {r.metric: r.value for r in split_leakage_audit(df).collect()}
    assert m["cross_split_pairs"] == 0
    assert m["cross_split_pairs_naive"] >= 1
    assert m["near_dup_groups"] >= 1
    assert sum(v for k, v in m.items() if k.startswith("docs_")) == 32


def test_split_is_deterministic_and_total(spark, corpus):
    df, _, _ = corpus
    a = sorted(map(tuple, leakage_safe_split(df).collect()))
    b = sorted(map(tuple, leakage_safe_split(df).collect()))
    assert a == b
    assert {r[2] for r in a} <= {"train", "val", "test"}
