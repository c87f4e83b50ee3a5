"""Anchor-text census: top-K contract, kernel agreement with host_edges,
map-side WindowGroupLimit trim, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import graphops

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def anchors(spark):
    docs = spark.read.parquet(SF)
    return graphops.anchor_text(docs).toPandas()


def test_topk_contract(anchors):
    assert len(anchors) > 0
    g = anchors.groupby("host")
    assert (g["rank"].max() <= graphops.ANCHOR_TOPK).all()
    for _, grp in g:
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        # rank order = count desc, term asc
        pairs = list(zip(-grp.n, grp.anchor_term))
        assert pairs == sorted(pairs)
        assert (grp.host_anchors >= grp.n.sum()).all()


def test_hosts_match_edge_universe(spark, anchors):
    # every anchor target is a host the edge census can produce (same kernel)
    docs = spark.read.parquet(SF)
    dsts = {r.dst for r in graphops.host_edges(docs).collect()}
    srcs = {r.src for r in graphops.host_edges(docs).collect()}
    assert set(anchors.host) <= dsts | srcs


def test_windowgrouplimit_in_plan(spark):
    docs = spark.read.parquet(SF)
    plan = (
        graphops.anchor_text(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_mirror(spark, anchors):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(graphops.sql_anchor_text()).df()
    key = ["host", "rank"]
    sp = anchors.sort_values(key).reset_index(drop=True)
    du = du.sort_values(key).reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
