"""Partition audit semantics: a perfectly uniform layout scores Gini ~0
and max/mean ~1000 milli; a pathologically skewed layout scores high on
both; the Gini formula is checked against a hand computation. Value
parity runs in the oracle suite (corpus_partition_audit)."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.packing import partition_audit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_uniform_layout_balanced(spark):
    # identical doc sizes, many docs: bucket loads are multinomial-even
    rows = [(i, "ten tokens of identical text in every document here x") for i in range(4000)]
    out = partition_audit(_docs(spark, rows), n_buckets=16).collect()[0]
    assert out["n_buckets"] == 16
    assert out["n_docs"] == 4000
    # max/mean within 25% of perfectly even; gini small
    assert out["maxmean_milli"] <= 1250
    assert out["gini_milli"] <= 120


def test_skewed_layout_flagged(spark):
    # one giant document dominates the token mass -> its bucket is hot
    rows = [(i, "small doc body") for i in range(200)]
    rows.append((9999, "giant " * 5000))
    out = partition_audit(_docs(spark, rows), n_buckets=16).collect()[0]
    assert out["maxmean_milli"] >= 5000  # hot bucket >= 5x the mean
    assert out["gini_milli"] >= 500


def test_gini_hand_check(spark):
    # engineer loads by doc size: find four docs in distinct buckets and
    # recompute gini by hand from the census the operator reports
    import hashlib

    def bucket(doc_id, n=4):
        return int(hashlib.md5(f"pb|{doc_id}".encode()).hexdigest()[:8], 16) % n

    # pick doc ids in distinct buckets of a 4-bucket layout
    chosen, seen = [], set()
    i = 0
    while len(chosen) < 4:
        b = bucket(i)
        if b not in seen:
            seen.add(b)
            chosen.append((i, b))
        i += 1
    sizes = {0: 1, 1: 2, 2: 3, 3: 10}  # tokens per bucket
    rows = [(doc, "w " * sizes[b]) for doc, b in chosen]
    out = partition_audit(_docs(spark, rows), n_buckets=4).collect()[0]
    xs = sorted(sizes.values())
    n, S = len(xs), sum(xs)
    iws = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (1000 * (2 * iws - (n + 1) * S)) // (n * S)
    assert out["gini_milli"] == gini
    assert out["max_load"] == 10 and out["min_load"] == 1
