"""Budget allocation plan: cap/shortfall arithmetic, quality-weighting
direction, conservation, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import packing

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def plan(spark):
    docs = spark.read.parquet(SF)
    return packing.budget_plan(docs).toPandas()


def test_cap_and_shortfall_arithmetic(plan):
    assert len(plan) > 0
    for r in plan.itertuples():
        assert r.alloc_tokens <= packing.BP_MAX_EPOCHS * r.n_tokens
        assert r.epochs_milli == (1000 * r.alloc_tokens) // r.n_tokens
        assert r.epochs_milli <= 1000 * packing.BP_MAX_EPOCHS
        if r.capped:
            assert r.shortfall_tokens > 0
            assert r.alloc_tokens == packing.BP_MAX_EPOCHS * r.n_tokens
        else:
            assert r.shortfall_tokens == 0


def test_budget_conservation(plan):
    # raw allocations (alloc + shortfall) sum to the budget modulo the
    # per-source integer-division undershoot
    budget = packing.BP_BUDGET_X * plan.n_tokens.sum()
    raw = (plan.alloc_tokens + plan.shortfall_tokens).sum()
    assert budget - len(plan) <= raw <= budget


def test_quality_weighting_direction(plan):
    # allocation per token (epochs) must be monotone in quality across the
    # uncapped sources: the highest-quality uncapped source gets at least
    # as many epochs as the lowest-quality one
    un = plan[~plan.capped]
    if len(un) >= 2:
        hi = un.loc[un.quality_milli.idxmax()]
        lo = un.loc[un.quality_milli.idxmin()]
        assert hi.epochs_milli >= lo.epochs_milli


def test_mirror(spark, plan):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(packing.sql_budget_plan()).df()
    sp = plan.sort_values("source").reset_index(drop=True)
    du = du.sort_values("source").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
