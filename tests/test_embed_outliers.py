"""Embedding outlier sweep: planted corrupted twins flag, healthy
originals don't, arithmetic invariants, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import similarity

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def swept(spark):
    emb = spark.read.parquet(SF)
    return similarity.embed_outliers(emb).toPandas()


def test_planted_separation(swept):
    planted = swept[swept.vec_id >= similarity.OL_OFFSET]
    healthy = swept[swept.vec_id < similarity.OL_OFFSET]
    assert len(planted) > 0
    # every saturated twin flags; no healthy vector does
    assert planted.outlier.all()
    assert not healthy.outlier.any()


def test_arithmetic(swept):
    for r in swept.itertuples():
        assert r.ratio_milli == (1000 * r.d2) // r.mean_d2
        assert r.outlier == (r.ratio_milli > similarity.OL_X_MILLI)
        assert r.d2 >= 0 and r.mean_d2 > 0
    # one row per corpus vector (originals + plants)
    assert swept.vec_id.is_unique


def test_mirror(spark, swept):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}'")
    du = con.sql(similarity.sql_embed_outliers()).df()
    sp = swept.sort_values("vec_id").reset_index(drop=True)
    du = du.sort_values("vec_id").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
