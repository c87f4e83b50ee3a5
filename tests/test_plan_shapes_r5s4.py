"""Plan-shape gates for the round-5 session-4 operators: the zero-shuffle
and Exchange-budget claims in the docstrings, pinned so a refactor cannot
silently regress them."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.htmlops import html_meta
from pdfextract_spark.functions.textops import (
    gate_agreement,
    ocr_artifacts,
    synthesize_ocr_corpus,
)
from pdfextract_spark.functions.clustering import dim_stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_ocr_artifacts_zero_exchange(docs):
    plan = _plan(ocr_artifacts(synthesize_ocr_corpus(docs)))
    assert "Exchange" not in plan, plan[:1500]


def test_html_meta_zero_exchange(docs):
    plan = _plan(html_meta(docs))
    assert "Exchange" not in plan, plan[:1500]


def test_gate_agreement_single_global_agg(docs):
    # one global conditional-sum aggregate: exactly one Exchange
    # (SinglePartition for the final merge), no joins, no hints
    df = gate_agreement(docs)
    plan = _plan(df)
    assert plan.count("Exchange") <= 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    assert "ResolvedHint" not in _analyzed(df)


def test_dim_stats_one_agg_no_input_explode(emb):
    # ONE aggregation exchange, and the only Generate is the 64-struct
    # RESULT explode sitting ABOVE the aggregate (the input vector column
    # is never exploded — that would shuffle 64x the rows)
    plan = _plan(dim_stats(emb))
    # agg merge exchange + the final orderBy range exchange
    assert plan.count("Exchange") <= 2, plan[:1500]
    assert plan.count("Generate") == 1, plan[:1500]
    assert plan.index("Generate") < plan.index("HashAggregate"), plan[:1500]
