"""Physical-plan shape assertions for the round-5 session's operators:
Exchange budgets and no-hard-hint contracts from the docstrings, enforced
so a future change cannot silently regress them."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.sketches import heavy_hitters, hll_host_distinct
from pdfextract_spark.functions.webclean import temperature_mixture

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_hll_shuffle_budget(docs):
    # (host, reg) census Exchange -> host fold Exchange, the exact-audit
    # census (partial count_distinct: two more), the audit join, and the
    # final orderBy range Exchange; partial aggregation must be present
    plan = _plan(hll_host_distinct(docs))
    assert plan.count("Exchange") <= 6, plan[:1500]
    assert "partial_max" in plan or "partial" in plan, plan[:1500]


def test_hll_no_hard_hints(docs):
    a = _analyzed(hll_host_distinct(docs))
    assert "ResolvedHint" not in a and "UnresolvedHint" not in a


def test_heavy_hitters_no_vocab_shuffle_before_filter(docs):
    # the ONLY aggregations may be: the 2048-cell census (bounded), the
    # 1-row total, and the survivor census (bounded by total/threshold);
    # the probe joins must carry no planner-forced broadcast hints
    df = heavy_hitters(docs)
    a = _analyzed(df)
    assert "ResolvedHint" not in a and "UnresolvedHint" not in a
    plan = _plan(df)
    # census + total + survivor census + orderBy, with AQE join exchanges
    # for the 4 probes; bound the total so a vocab-wide regroup (which
    # would add paired partial/final exchanges per token column) shows up
    assert plan.count("Exchange") <= 12, plan[:2000]


def test_temperature_corpus_never_regrouped(docs):
    # exactly three aggregation surfaces: the language census, the 1-row
    # normalizer, and the kept census — all keyed on lang (language-space);
    # plus the rate join and final orderBy. No hard hints.
    df = temperature_mixture(docs)
    a = _analyzed(df)
    assert "ResolvedHint" not in a and "UnresolvedHint" not in a
    plan = _plan(df)
    assert plan.count("Exchange") <= 8, plan[:2000]


def test_graph_iterations_plan_from_checkpointed_leaves(spark):
    # HITS: the final plan extends only from the last round's checkpointed
    # leaves (the 472-join naive plan is the regression this pins);
    # TrustRank: linear unrolled chain, no checkpoint needed, joins bounded
    # by 3 per iteration + assembly
    from pdfextract_spark.functions.graphops import (
        PR_ITERS,
        host_hits,
        trust_rank,
    )

    docs = spark.range(80).select(F.col("id").alias("doc_id"))
    hits_plan = host_hits(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert hits_plan.count("Join") <= 12, hits_plan[:1200]
    tr_plan = trust_rank(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert tr_plan.count("Join") <= 3 * PR_ITERS + 4, tr_plan[:1200]


def test_edit_verify_shuffle_budget(docs):
    # candidate machinery (hot-bucket census + anti-join + bucket groupBy)
    # plus the two edit-key joins; no planner-forced hints — AQE may pick
    # broadcast at fixture scale but nothing in the plan demands it
    from pdfextract_spark.functions.dedup import edit_verified_neardups

    df = edit_verified_neardups(docs)
    a = _analyzed(df)
    assert "ResolvedHint" not in a and "UnresolvedHint" not in a
    plan = _plan(df)
    assert plan.count("Exchange") <= 8, plan[:2000]
    # the banded threshold must reach the physical plan (the -1 fast path)
    assert "levenshtein" in plan and "102" in plan, plan[:2000]


def test_bitext_no_window_sort_no_hints(spark):
    # forward-best must be the struct-max groupBy, not a window sort, and
    # nothing in the plan may force a broadcast
    from pdfextract_spark.functions.similarity import bitext_mine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = bitext_mine(emb)
    a = _analyzed(df)
    assert "ResolvedHint" not in a and "UnresolvedHint" not in a
    plan = _plan(df)
    # fwd is localCheckpointed, so the visible plan is the mutuality join
    # over the checkpoint leaf; no Window may appear anywhere downstream
    assert "Window" not in plan, plan[:2000]


def test_shard_plan_budget_and_bounded_window(docs):
    # host census (localCheckpointed once at runtime; the static plan
    # repeats it per consumer) + 1-row total + bounded-candidate rank +
    # tail anti-join + final per-shard groupBy/orderBy; the only window
    # sort runs over the pigeonhole-bounded candidate frame
    from pdfextract_spark.functions.packing import (
        shard_plan,
        synthesize_skewed_hosts,
    )

    df = shard_plan(synthesize_skewed_hosts(docs))
    plan = _plan(df)
    assert plan.count("Exchange") <= 10, plan[:2000]
    analyzed = _analyzed(df)
    assert "hint" not in analyzed.lower()  # hint-free: AQE decides
