"""Streaming banded-simhash near-dup (VERDICT r2 task #6): a near-duplicate
arriving in a LATER micro-batch is paired against the earlier keeper via
band-bucket state; saturated buckets trim-and-report like batch.

Fixture premise (asserted, not assumed): BASE vs NEAR differ in one word,
their 60-bit simhashes are within SIMHASH_HAM_MAX, and they share >= 1 of
the 4 15-bit bands; OTHER/OTHER2 are unrelated content.
"""

import hashlib
import os

import pandas as pd
import pytest

from pdfextract_spark.functions.dedup import SIMHASH_HAM_MAX
from pdfextract_spark.streaming.neardup_stream import streaming_neardup

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong coffee under ancient oak trees near quiet rivers every morning"
)
NEAR = BASE.replace("brew", "latte")
OTHER = "completely different content about spacecraft telemetry and orbital mechanics analysis systems"
OTHER2 = "unrelated financial report covering quarterly revenue margins and operating expense breakdowns"


def _simhash(text: str) -> int:
    acc = [0] * 60
    for t in text.split(" "):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for b in range(60):
            acc[b] += ((h >> b) & 1) * 2 - 1
    return sum(1 << b for b in range(60) if acc[b] > 0)


def test_fixture_premise():
    s1, s2 = _simhash(BASE), _simhash(NEAR)
    assert bin(s1 ^ s2).count("1") <= SIMHASH_HAM_MAX
    assert any(
        (s1 >> (j * 15)) & 0x7FFF == (s2 >> (j * 15)) & 0x7FFF for j in range(4)
    )
    s3 = _simhash(OTHER)
    assert bin(s1 ^ s3).count("1") > SIMHASH_HAM_MAX


def _drain(spark, in_dir, out, ckpt, **kw):
    stream = spark.readStream.schema("doc_id string, text string").parquet(in_dir)
    q = (
        streaming_neardup(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_cross_micro_batch_neardup_pairs(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir, exist_ok=True)

    b1 = pd.DataFrame({"doc_id": ["a", "z"], "text": [BASE, OTHER]})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out, ckpt)
    rows1 = spark.read.parquet(out).collect()
    assert [r for r in rows1 if r["kind"] == "pair"] == []

    # batch 2: 'b' is a near-dup of batch-1's 'a'; 'c' is unrelated
    b2 = pd.DataFrame({"doc_id": ["b", "c"], "text": [NEAR, OTHER2]})
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out, ckpt)
    pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.read.parquet(out).collect()
        if r["kind"] == "pair"
    }
    # the pair may surface from several bands; distinct (a, b) is the verdict
    assert {(a, b) for a, b, _ in pairs} == {("a", "b")}
    assert all(h <= SIMHASH_HAM_MAX for _, _, h in pairs)


def test_bucket_cap_trims_and_reports(spark, tmp_path):
    in_dir = str(tmp_path / "in_cap")
    out = str(tmp_path / "out_cap")
    ckpt = str(tmp_path / "ckpt_cap")
    os.makedirs(in_dir, exist_ok=True)

    # 4 identical docs, cap 2: d1/d2 fill the bucket (1 pair), d3/d4 trimmed
    b = pd.DataFrame({"doc_id": [f"d{i}" for i in range(1, 5)], "text": [BASE] * 4})
    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out, ckpt, max_bucket=2)
    rows = spark.read.parquet(out).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows if r["kind"] == "pair"}
    assert pairs == {("d1", "d2")}
    trims = [r for r in rows if r["kind"] == "trimmed"]
    assert trims and all(r["hamming"] == 2 for r in trims)  # 2 docs trimmed/band
