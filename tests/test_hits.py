"""HITS hub/authority semantics on planted graphs: mutual reinforcement,
max-normalization bounds, zero scores for disconnected roles, and the
fixed-point determinism contract. Value-level DuckDB parity runs in the
parametrized oracle suite (graph_host_hits)."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.graphops import (
    HITS_ITERS,
    HITS_SCALE,
    hits_scores,
    host_hits,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


@pytest.fixture(scope="module")
def star(spark):
    # two perfect hubs each pointing at the same three authorities, plus a
    # weaker hub u3 that only covers v1
    pairs = [
        ("u1", "v1"), ("u1", "v2"), ("u1", "v3"),
        ("u2", "v1"), ("u2", "v2"), ("u2", "v3"),
        ("u3", "v1"),
    ]
    out = {r["host"]: r for r in hits_scores(_edges(spark, pairs)).collect()}
    return out


def test_roles_separate(star):
    # pure hubs have zero authority; pure authorities have zero hub score
    for u in ("u1", "u2", "u3"):
        assert star[u]["auth"] == 0
    for v in ("v1", "v2", "v3"):
        assert star[v]["hub"] == 0


def test_max_normalization_bounds(star):
    scores = [s for r in star.values() for s in (r["hub"], r["auth"])]
    assert max(scores) == HITS_SCALE
    assert all(0 <= s <= HITS_SCALE for s in scores)
    # the best hub and the best authority both sit at the scale ceiling
    assert star["u1"]["hub"] == HITS_SCALE
    assert star["v1"]["auth"] == HITS_SCALE


def test_mutual_reinforcement(star):
    # u1/u2 cover all three authorities -> stronger hubs than u3 (one link)
    assert star["u1"]["hub"] == star["u2"]["hub"] > star["u3"]["hub"] > 0
    # v1 is linked by all three hubs -> strongest authority
    assert star["v1"]["auth"] > star["v2"]["auth"] == star["v3"]["auth"] > 0


def test_deterministic_and_static_plan(spark):
    docs = spark.range(150).select(F.col("id").alias("doc_id"))
    a = [tuple(r) for r in host_hits(docs).collect()]
    b = [tuple(r) for r in host_hits(docs).collect()]
    assert a == b and len(a) > 0
    # unrolled static plan: join count is bounded by the iteration constant
    plan = host_hits(docs)._jdf.queryExecution().optimizedPlan().toString()
    # the per-round localCheckpoint keeps the unrolled plan constant-size:
    # the final plan only extends from the last round's checkpointed
    # leaves (the naive self-referential normalizer measured 472 joins)
    assert plan.count("Join") <= 12
    assert HITS_SCALE % 2 == 0


def test_hub_vs_pagerank_roles(spark):
    # on the synthesized census, authority mass concentrates where in-links
    # do (same direction as PageRank) while hub mass follows out-links
    from pdfextract_spark.functions.graphops import host_edges

    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    edges = host_edges(docs)
    indeg = {r["dst"]: r["n"] for r in
             edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n")).collect()}
    scores = host_hits(docs).collect()
    top_auth = max(scores, key=lambda r: r["auth"])["host"]
    top_in = sorted(indeg, key=lambda h: -indeg[h])
    assert top_auth in top_in[: max(3, len(top_in) // 4)]
