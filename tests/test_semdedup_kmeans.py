"""SemDeDup proper (Abbas et al. 2023): k-means partition -> exact
within-cluster cosine pairs -> connected-components keeper.

Complements test_semantic_dedup.py (hyperplane-LSH candidate generator);
here the candidate generator is the paper's own — spatial clustering —
so the contract adds the boundary-straddle recall pin: a planted duplicate
is found iff k-means lands both copies in the same cluster, and on the
planted corpus (copy = original + one dyadic nudge, cos > 0.999) that must
be nearly always.

Contracts:
- planted-pair recall >= 0.9 (straddle losses are the documented trade-off;
  the nudge is tiny so they should be rare);
- keeper = cluster-min vec_id => the ORIGINAL is kept, never the copy;
- background vectors (max pairwise cos ~0.47 << SEM_COS_MIN=0.9) never
  cluster: every component is exactly {original, planted copy};
- Spark == DuckDB on the full (vec_id, rep, is_keeper) relation at sf0.001
  (the driver gate's value-hash contract).
"""

import hashlib

import duckdb
import pandas as pd

from pdfextract_spark.functions import similarity

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


def _planted_ids(con) -> set:
    return {
        r[0]
        for r in con.sql(
            f"SELECT vec_id FROM '{SF_DIR}/embeddings.parquet' "
            f"WHERE (('0x' || substr(md5('sem|' || CAST(vec_id AS VARCHAR)), 1, 4))"
            f"::BIGINT) % {similarity.SEM_PLANT_MOD} = 0"
        ).fetchall()
    }


def test_semdedup_kmeans_planted_recall_and_keeper(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = similarity.semdedup_kmeans(emb).toPandas()
    con = duckdb.connect()
    planted = _planted_ids(con)
    assert planted, "fixture selects no planted vectors — test premise broken"

    rep = dict(zip(out.vec_id, out.rep))
    hits = sum(
        1
        for v in planted
        if rep.get(v + similarity.SEM_ID_OFFSET) is not None
        and rep.get(v + similarity.SEM_ID_OFFSET) == rep.get(v)
    )
    recall = hits / len(planted)
    assert recall >= 0.9, f"planted semantic-dup recall {recall} (cluster straddles)"

    keep = dict(zip(out.vec_id, out.is_keeper))
    for v in planted:
        pid = v + similarity.SEM_ID_OFFSET
        if pid in rep:
            assert not keep[pid], f"planted copy {pid} marked keeper"
            assert rep[pid] <= v

    # clustering bounds the pair search but must not ADD pairs: the random
    # background can never pass SEM_COS_MIN, so components stay size 2
    sizes = out.groupby("rep").size()
    assert (sizes == 2).all(), sizes[sizes != 2]


def test_semdedup_kmeans_matches_duckdb_oracle(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sp = similarity.semdedup_kmeans(emb).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    du = con.sql(similarity.sql_semdedup_kmeans()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)


def test_block_decomposition_matches_naive_cluster_join(spark):
    """The triangle-block split of the within-cluster self-join must emit
    exactly the naive (cluster, sub)-keyed join's pair set (every unordered
    co-bucketed pair once, a < b) — here pinned after the cosine filter on
    the full planted corpus. The naive side applies the same SEM_MAX_CLUSTER
    width census / hyperplane sub-refinement / over-cap drop as production
    but with a PLAIN self-join, so what this test isolates is the
    triangle-block machinery and the anti-join wiring."""
    from pyspark.sql import Window, functions as F

    from pdfextract_spark.functions.similarity import (
        SEM_COS_MIN,
        SEM_MAX_CLUSTER,
        _cos,
        _idot,
        _sub_bucket,
        _with_quant,
        synthesize_semantic_corpus,
    )
    from pdfextract_spark.functions.clustering import kmeans_assign

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = synthesize_semantic_corpus(emb)
    assign = kmeans_assign(corpus, k=similarity.SEMDEDUP_K).select(
        "vec_id", "cluster"
    )
    quant = _with_quant(corpus).join(assign, "vec_id")
    # same cap semantics as production, naive formulation (window census)
    quant = quant.withColumn(
        "width", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    ).withColumn(
        "sub",
        F.when(F.col("width") <= SEM_MAX_CLUSTER, F.lit(0))
        .otherwise(_sub_bucket(F.col("q")))
        .cast("int"),
    ).withColumn(
        "sw", F.count(F.lit(1)).over(Window.partitionBy("cluster", "sub"))
    ).filter(F.col("sw") <= SEM_MAX_CLUSTER)
    a, b = quant.alias("a"), quant.alias("b")
    cos = _cos(_idot(F.col("a.q"), F.col("b.q")), F.col("a.n2"), F.col("b.n2"))
    naive = {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= SEM_COS_MIN)
        .collect()
    }
    # the production path's pairs are what feed connected_components;
    # reproduce them by reading the component edges back from the keeper
    # relation is lossy, so re-derive via the module's own pair builder:
    # semdedup_kmeans's output clusters {original, copy} 1:1 with pairs
    out = similarity.semdedup_kmeans(emb).toPandas()
    comp_pairs = {
        (int(r.rep), int(r.vec_id))
        for r in out.itertuples()
        if not r.is_keeper
    }
    assert comp_pairs == naive
