"""k-means (functions/clustering.py): determinism, planted-structure
recovery, and engine==oracle parity on a tiny hand-checkable corpus."""

import duckdb
import pytest

from pdfextract_spark.functions.clustering import kmeans_assign, sql_kmeans_assign

DIM = 4


def _vec(*vals):
    return [float(v) for v in vals] + [0.0] * (DIM - len(vals))


# two tight planted blobs far apart in the first two dims; k=2 must put
# each blob in one cluster regardless of which seeds md5 picks
BLOB_A = [_vec(0.9, 0.9), _vec(0.85, 0.92), _vec(0.88, 0.87), _vec(0.91, 0.9)]
BLOB_B = [_vec(-0.9, -0.9), _vec(-0.86, -0.91), _vec(-0.9, -0.88)]
ROWS = [(i, v, 0) for i, v in enumerate(BLOB_A + BLOB_B)]
SCHEMA = "vec_id long, embedding array<float>, label int"


def test_two_blobs_separate(spark):
    out = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(
            spark.createDataFrame(ROWS, SCHEMA), k=2, iters=2, dim=DIM
        ).collect()
    }
    a_clusters = {out[i] for i in range(4)}
    b_clusters = {out[i] for i in range(4, 7)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_partitioning_invariance(spark):
    """md5 seeding + exact integer arithmetic: the assignment must not
    depend on input partitioning (rand()-seeded k-means does)."""
    df1 = spark.createDataFrame(ROWS, SCHEMA).repartition(1)
    df7 = spark.createDataFrame(ROWS, SCHEMA).repartition(7)
    r1 = sorted(map(tuple, kmeans_assign(df1, k=2, iters=2, dim=DIM).collect()))
    r7 = sorted(map(tuple, kmeans_assign(df7, k=2, iters=2, dim=DIM).collect()))
    assert r1 == r7


def test_duckdb_mirror_parity(spark):
    sdf = sorted(
        map(
            tuple,
            kmeans_assign(
                spark.createDataFrame(ROWS, SCHEMA), k=2, iters=2, dim=DIM
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INT)")
    for vid, emb, lab in ROWS:
        con.execute("INSERT INTO embeddings VALUES (?, ?, ?)", [vid, emb, lab])
    ddf = sorted(
        tuple(r) for r in con.execute(sql_kmeans_assign(k=2, iters=2, dim=DIM)).fetchall()
    )
    assert sdf == ddf


def test_empty_cluster_keeps_seed_centroid(spark):
    """k larger than the number of natural groups: seeds that capture no
    points keep their centroid instead of crashing or drifting — and the
    SQL mirror agrees (its COALESCE path)."""
    rows = [(i, _vec(0.5, 0.5), 0) for i in range(3)]  # 3 identical points
    df = spark.createDataFrame(rows, SCHEMA)
    out = kmeans_assign(df, k=2, iters=2, dim=DIM).collect()
    assert len(out) == 3
    # identical points all land in one cluster (argmin ties -> smaller k
    # relative to the two identical centroids after round 1)
    assert len({r["cluster"] for r in out}) == 1
