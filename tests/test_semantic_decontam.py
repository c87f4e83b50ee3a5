"""Semantic decontamination: planted paraphrase leaks are all caught
(recall 1.0), nothing else is flagged (the fixture's random vectors sit
far below the threshold), and each leak maps back to its bench original.
Value parity runs in the oracle suite (corpus_decontam_semantic)."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.similarity import (
    SDC_BENCH_MOD,
    SDC_ID_OFFSET,
    SDC_LEAK_MOD,
    semantic_decontam,
    synthesize_decontam_split,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.select("vec_id", "embedding")


@pytest.fixture(scope="module")
def flagged(emb):
    return {r["vec_id"]: r for r in semantic_decontam(emb).collect()}


def _planted(emb):
    split = synthesize_decontam_split(emb)
    return {
        r["vec_id"]
        for r in split.filter(
            (F.col("side") == "corpus") & (F.col("vec_id") >= SDC_ID_OFFSET)
        ).collect()
    }


def test_all_planted_leaks_caught(emb, flagged):
    planted = _planted(emb)
    assert planted, "synthesis must plant at least one leak"
    assert planted <= set(flagged), planted - set(flagged)


def test_no_false_positives(emb, flagged):
    # random fixture vectors max out near cos 0.47 — far below the 0.9
    # gate — so ONLY planted leaks may be flagged
    planted = _planted(emb)
    assert set(flagged) == planted


def test_leak_maps_to_its_original(flagged):
    for vec_id, r in flagged.items():
        assert r["bench_id"] == vec_id - SDC_ID_OFFSET
        assert r["cos_sim"] >= 0.99


def test_split_is_disjoint_and_sized(emb):
    split = synthesize_decontam_split(emb)
    sides = {r["side"]: r["n"] for r in
             split.groupBy("side").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = emb.count()
    assert sides["bench"] + sides["corpus"] > n  # leaks add corpus rows
    assert 0 < sides["bench"] < n // 2
    # bench and corpus ids overlap only through the offset namespace
    b = {r["vec_id"] for r in split.filter(F.col("side") == "bench").collect()}
    c = {r["vec_id"] for r in split.filter(F.col("side") == "corpus").collect()}
    assert not (b & {x for x in c if x < SDC_ID_OFFSET})
    assert SDC_BENCH_MOD > 1 and SDC_LEAK_MOD > 1
