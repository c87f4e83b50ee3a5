"""Cluster-balanced sampling (diversity-preserving per-cluster quota).

Contracts:
- no cluster keeps more than cap vectors; clusters smaller than the cap
  keep everything;
- determinism + nesting: cap=8's survivors are exactly cap=16's
  rank<=8 prefix (md5-priority, reproducible across runs/cluster sizes);
- scale: the physical plan contains WindowGroupLimit (map-side partial
  top-cap per cluster BEFORE the exchange — the domain_cap precedent);
- Spark == DuckDB on the full (vec_id, cluster, rank_in_cluster) relation.
"""

import hashlib

import duckdb
import pandas as pd

from pdfextract_spark.functions import clustering

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def test_cluster_sample_quota_and_nesting(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out16 = clustering.cluster_sample(emb, cap=16).toPandas()
    out8 = clustering.cluster_sample(emb, cap=8).toPandas()

    sizes = out16.groupby("cluster").size()
    assert (sizes <= 16).all()
    assert (out16.rank_in_cluster >= 1).all()

    full = clustering.kmeans_assign(emb).toPandas().groupby("cluster").size()
    for c, n in full.items():
        assert sizes.get(c, 0) == min(n, 16), (c, n)

    kept8 = set(out8.vec_id)
    prefix = set(out16[out16.rank_in_cluster <= 8].vec_id)
    assert kept8 == prefix


def test_cluster_sample_plan_has_window_group_limit(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        clustering.cluster_sample(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_cluster_sample_matches_duckdb_oracle(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sp = clustering.cluster_sample(emb).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    du = con.sql(clustering.sql_cluster_sample()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)


def test_cluster_stats_matches_duckdb_and_totals(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sp = clustering.cluster_stats(emb).toPandas()
    assign = clustering.kmeans_assign(emb).toPandas()
    # totals reconcile with the assignment relation exactly
    assert sp.n_vecs.sum() == len(assign)
    assert sp.inertia.sum() == assign.dist.sum()
    assert (sp.mean_dist == sp.inertia // sp.n_vecs).all()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    du = con.sql(clustering.sql_cluster_stats()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
