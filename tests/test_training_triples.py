"""Contrastive training triples: side contracts, consistency with
hard_negatives, margin arithmetic, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import similarity

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF)


@pytest.fixture(scope="module")
def triples(spark, emb):
    return similarity.training_triples(emb).toPandas()


def test_side_contracts(spark, emb, triples):
    assert len(triples) > 0
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in triples.itertuples():
        assert labels[r.pos_id] == r.label
        assert labels[r.neg_id] != r.label
        assert r.pos_id != r.vec_id and r.neg_id != r.vec_id
        assert r.margin_milli == round((r.pos_cos - r.neg_cos) * 1000)


def test_negative_side_matches_hard_negatives(spark, emb, triples):
    # the triple's negative must be exactly what hard_negatives mines for
    # the same anchor (same candidate relation, same tie-break)
    hn = {
        r.vec_id: (r.neg_id, r.cos_sim)
        for r in similarity.hard_negatives(emb).collect()
    }
    for r in triples.itertuples():
        assert hn[r.vec_id] == (r.neg_id, r.neg_cos)


def test_mirror(spark, triples):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}'")
    du = con.sql(similarity.sql_training_triples()).df()
    sp = triples.sort_values("vec_id").reset_index(drop=True)
    du = du.sort_values("vec_id").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
