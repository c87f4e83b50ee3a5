"""Physical-plan shape assertions for the round-5 operators: Exchange
budgets and no-hard-hint rules, same contract as test_plan_shapes_r4."""

import pytest

from pdfextract_spark.functions.curation import doremi_weights
from pdfextract_spark.functions.dedup import (
    keep_best_dedup,
    synthesize_quality_dup_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_keep_best_single_census_shuffle(docs):
    # fingerprint + shout score are narrow Projects; the census is ONE
    # groupBy(fp) with map-side partial struct-min — exactly one Exchange,
    # no window, no join-back.
    plan = _plan(keep_best_dedup(synthesize_quality_dup_corpus(docs)))
    assert plan.count("Exchange") == 1, plan[:1200]
    assert "partial_min" in plan, plan[:1200]
    assert "Window" not in plan, plan[:1200]


def test_doremi_weights_no_hard_broadcast_hint(docs):
    # the LM vocab broadcast inside unigram_perplexity is cap-bounded
    # (VOCAB_CAP) and allowlisted; beyond it the domain relation must reach
    # the min/total crossJoins with NO planner-forced hint on anything
    # corpus-sized.
    df = doremi_weights(docs)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed
    # domain census: the groupBy(source) partial-aggregates map-side
    plan = _plan(df)
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
