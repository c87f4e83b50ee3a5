"""PQ recall eval: per-query contracts, arithmetic consistency, nonzero
recall sanity, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import clustering

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def recall(spark):
    emb = spark.read.parquet(SF)
    return clustering.pq_recall(emb).toPandas()


def test_contracts(recall):
    # one row per query in the bounded query set
    assert len(recall) == min(clustering.PQ_N_QUERY, 500)
    assert recall.vec_id.is_unique
    assert (recall.vec_id < clustering.PQ_N_QUERY).all()
    assert (recall.n_common <= clustering.PQ_TOPK).all()
    assert (recall.n_common >= 0).all()
    for r in recall.itertuples():
        assert r.overlap_milli == (1000 * r.n_common) // clustering.PQ_TOPK
        # top1 kept implies at least one common neighbour
        if r.top1_kept:
            assert r.n_common >= 1


def test_quantization_finds_signal(recall):
    # IVFADC with nprobe=2 over label cells must recover SOME true
    # neighbours — zero everywhere would mean the eval is vacuous
    assert recall.n_common.sum() > 0
    assert recall.top1_kept.any()


def test_mirror(spark, recall):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}'")
    du = con.sql(clustering.sql_pq_recall()).df()
    sp = recall.sort_values("vec_id").reset_index(drop=True)
    du = du.sort_values("vec_id").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
