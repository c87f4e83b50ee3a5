"""Matryoshka truncation eval: monotone overlap in width, full-width
self-agreement, planted-prefix-heavy case, DuckDB mirror equality."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import similarity

SF = "/root/testdata/sf0.001/embeddings.parquet"


def test_matryoshka_overlap_monotone(spark):
    emb = spark.read.parquet(SF)
    out = (
        similarity.matryoshka_overlap(emb)
        .toPandas()
        .sort_values("m_dims")
        .reset_index(drop=True)
    )
    assert list(out.m_dims) == sorted(similarity.MRL_DIMS)
    assert (out.n_queries == similarity.N_QUERY).all()
    # wider prefixes agree more with the full ranking (weak monotonicity —
    # a fixture property; deterministic, so stable)
    assert out.mean_overlap_milli.is_monotonic_increasing
    assert (out.mean_overlap_milli <= 1000).all()
    assert (out.top1_matches <= out.n_queries).all()


def test_matryoshka_prefix_heavy_embeddings_truncate_cleanly(spark):
    # embeddings whose information lives in the FIRST dims (the MRL
    # training objective) must show near-total overlap at every width:
    # vector i = (i, i^2 mod 97, 0, 0, ...) — all signal in dims 1-2
    rows = [
        (i, [float(i + 1), float((i * i) % 97)] + [0.0] * (similarity.DIM - 2))
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.matryoshka_overlap(emb).toPandas()
    assert (out.mean_overlap_milli == 1000).all()
    assert (out.top1_matches == out.n_queries).all()


def test_matryoshka_mirror(spark):
    emb = spark.read.parquet(SF)
    sp = similarity.matryoshka_overlap(emb).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}'")
    du = con.sql(similarity.sql_matryoshka_overlap()).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))
