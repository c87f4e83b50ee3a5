"""Semantic (embedding-level) dedup keeper — the SemDeDup-shaped pipeline
(ann_lsh_pairs at a high cosine threshold -> connected components -> keeper
per cluster), round-3 verdict task #5.

Contracts:
- every planted near-duplicate (synthesize_semantic_corpus: vec_id +
  SEM_ID_OFFSET, one dyadic-nudged component) that the LSH recovers clusters
  with its original, and recall of planted pairs is >= 0.9;
- the keeper is the smallest vec_id of each cluster (so the ORIGINAL, never
  the planted copy, is kept);
- Spark == DuckDB on the full (vec_id, rep, is_keeper) relation (the driver
  gate's value-hash contract, checked here at sf0.001).
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


def test_semantic_dedup_planted_recall_and_keeper(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = similarity.semantic_dedup(emb).toPandas()
    con = duckdb.connect()
    planted = _planted_ids(con)
    assert planted, "fixture selects no planted vectors — test premise broken"

    rep = dict(zip(out.vec_id, out.rep))
    # recall: planted copy clusters with its original
    hits = sum(
        1
        for v in planted
        if rep.get(v + similarity.SEM_ID_OFFSET) is not None
        and rep.get(v + similarity.SEM_ID_OFFSET) == rep.get(v)
    )
    recall = hits / len(planted)
    assert recall >= 0.9, f"planted semantic-dup recall {recall}"

    # keeper selection: rep is the cluster min => the original is kept,
    # the planted copy (offset id) never is
    keep = dict(zip(out.vec_id, out.is_keeper))
    for v in planted:
        pid = v + similarity.SEM_ID_OFFSET
        if pid in rep:
            assert not keep[pid], f"planted copy {pid} marked keeper"
            assert rep[pid] <= v

    # the random background (max pairwise cos ~0.47) must not cluster:
    # every cluster is exactly {original, planted copy}
    sizes = out.groupby("rep").size()
    assert (sizes == 2).all(), sizes[sizes != 2]


def test_semantic_dedup_matches_duckdb_oracle(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sp = similarity.semantic_dedup(emb).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    du = con.sql(similarity.sql_semantic_dedup()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
