"""Link reciprocity: degree/reciprocity invariants vs the raw edge set,
symmetry of the reciprocated relation, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import graphops

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def edges(spark):
    docs = spark.read.parquet(SF)
    return {(r.src, r.dst) for r in graphops.host_edges(docs).collect()}


@pytest.fixture(scope="module")
def recip(spark):
    docs = spark.read.parquet(SF)
    return graphops.link_reciprocity(docs).toPandas()


def test_matches_raw_edges(edges, recip):
    for r in recip.itertuples():
        out_e = {d for (s, d) in edges if s == r.host}
        in_e = {s for (s, d) in edges if d == r.host}
        rec = {d for d in out_e if (d, r.host) in edges}
        assert r.out_deg == len(out_e)
        assert r.in_deg == len(in_e)
        assert r.reciprocated == len(rec)
        want = (1000 * len(rec)) // len(out_e) if out_e else 0
        assert r.recip_milli == want


def test_every_endpoint_present(edges, recip):
    hosts = {s for s, _ in edges} | {d for _, d in edges}
    assert set(recip.host) == hosts
    assert (recip.reciprocated <= recip.out_deg).all()
    assert (recip.recip_milli <= 1000).all()


def test_mirror(spark, recip):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(graphops.sql_link_reciprocity()).df()
    sp = recip.sort_values("host").reset_index(drop=True)
    du = du.sort_values("host").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
