"""Bitext mining: planted translation recall, mutuality/canonical-order
invariants, cross-label contract, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import similarity

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def mined(spark):
    emb = spark.read.parquet(SF)
    return similarity.bitext_mine(emb).toPandas()


@pytest.fixture(scope="module")
def planted_ids(spark):
    emb = spark.read.parquet(SF)
    corpus = similarity.synthesize_bitext_corpus(emb)
    return {
        r.vec_id - similarity.BT_ID_OFFSET
        for r in corpus.filter(
            corpus.vec_id >= similarity.BT_ID_OFFSET
        ).collect()
    }


def test_planted_recall(mined, planted_ids):
    got = {
        (r.vec_id_a, r.vec_id_b - similarity.BT_ID_OFFSET)
        for r in mined.itertuples()
        if r.vec_id_b >= similarity.BT_ID_OFFSET
    }
    hits = {a for a, b in got if a == b and a in planted_ids}
    assert len(planted_ids) > 0
    # every planted translation pair the LSH surfaces must be mutual-best;
    # multi-table LSH recall on a cos>0.999 pair is near-total
    assert len(hits) / len(planted_ids) >= 0.9


def test_cross_label_and_canonical(mined):
    assert len(mined) > 0
    assert (mined.label_a != mined.label_b).all()
    assert (mined.vec_id_a < mined.vec_id_b).all()
    assert (mined.cos_sim >= similarity.BT_COS_MIN).all()
    # mutual-best => each vector appears in at most one aligned pair per side
    assert mined.vec_id_a.is_unique and mined.vec_id_b.is_unique


def test_planted_pairs_dominate(mined, planted_ids):
    # natural vectors are far apart (max pairwise cos ~0.47), so >=90% of
    # mined alignments are the planted translations
    planted_rows = mined[
        (mined.vec_id_b - similarity.BT_ID_OFFSET) == mined.vec_id_a
    ]
    assert len(planted_rows) / len(mined) >= 0.9


def test_mirror(spark, mined):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}'")
    du = con.sql(similarity.sql_bitext_mine()).df()
    key = ["vec_id_a", "vec_id_b"]
    sp = mined.sort_values(key).reset_index(drop=True)
    du = du.sort_values(key).reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
