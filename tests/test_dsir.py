"""DSIR importance weights (Xie et al. 2023) — hashed-bigram target-vs-raw
LM log ratio in int64 fixed point, over the planted-target corpus
(synthesize_dsir_corpus: md5-selected ~1/4 of docs carry an appended
domain-marker phrase and play the curated target set).

Contracts:
- domain separation: every planted target doc out-scores the non-target
  mean, mean(target) > mean(non-target), and the above-corpus-mean
  dsir_keep flag captures a majority of target docs while excluding a
  majority of non-target docs;
- every doc appears exactly once (all fixture docs have >= 2 tokens);
- Spark == DuckDB on the full relation (value-hash, the driver contract).
"""

import hashlib

import duckdb
import pandas as pd

from pdfextract_spark.functions import textops

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


def _target_ids(con) -> set:
    return {
        str(r[0])
        for r in con.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
            f"WHERE (('0x' || substr(md5('dsirt|' || CAST(doc_id AS VARCHAR)), 1, 4))"
            f"::BIGINT) % {textops.DSIR_TARGET_MOD} = 0"
        ).fetchall()
    }


def test_dsir_separates_target_domain(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = textops.dsir_weights(docs).toPandas()
    con = duckdb.connect()
    targets = _target_ids(con)
    assert targets, "fixture selects no target docs — test premise broken"

    n_docs = con.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert len(out) == n_docs  # every fixture doc has >= 2 tokens

    is_t = out.doc_id.isin(targets)
    out = out.assign(per_gram=out.dsir_logratio_q4 / out.n_grams)
    tgt, rest = out[is_t], out[~is_t]
    assert len(tgt) == len(targets) and len(rest)
    # the length-normalized score separates the domains COMPLETELY on the
    # planted corpus (the keep flag compares exactly this, corpus-mean-side)
    assert tgt.per_gram.min() > rest.per_gram.max()
    assert tgt.dsir_keep.mean() > 0.5
    assert rest.dsir_keep.mean() < 0.5


def test_dsir_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = textops.dsir_weights(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(textops.sql_dsir_weights()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
