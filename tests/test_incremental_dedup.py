"""Incremental (new-batch-vs-history) exact dedup.

Contracts over the planted corpus (synthesize_incremental: md5 old/new
split, verbatim copies of ~1/4 of history docs and second copies of ~1/4
of batch docs planted into the batch):
- every planted copy-of-history doc is flagged dup_historical;
- every planted in-batch twin is flagged dup_in_batch and its original
  (smaller doc_id, same fingerprint, absent from history) stays kept;
- genuine batch docs with unique text are kept;
- statuses partition the batch (every batch doc appears exactly once);
- Spark == DuckDB on the full (doc_id, fingerprint, status) relation.
"""

import hashlib

import duckdb
import pandas as pd

from pdfextract_spark.functions import dedup

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


def _splits(con):
    rows = con.sql(
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"(('0x' || substr(md5('incr|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100)"
        f" AS bucket, "
        f"(('0x' || substr(md5('incp|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT"
        f" % {dedup.INC_PLANT_MOD} = 0) AS plant "
        f"FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    hist = {r[0] for r in rows if r[1] < dedup.INC_OLD_PCT}
    fresh = {r[0] for r in rows if r[1] >= dedup.INC_OLD_PCT}
    planted = {r[0] for r in rows if r[2]}
    return hist, fresh, planted


def test_incremental_dedup_statuses(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup.incremental_dedup(docs).toPandas()
    con = duckdb.connect()
    hist, fresh, planted = _splits(con)
    assert hist and fresh and (planted & hist) and (planted & fresh)

    status = dict(zip(out.doc_id, out.status))
    # batch = fresh + planted copies; each appears exactly once
    expected_ids = (
        fresh
        | {d + dedup.INC_HIST_OFFSET for d in hist & planted}
        | {d + dedup.INC_BATCH_OFFSET for d in fresh & planted}
    )
    assert set(out.doc_id) == expected_ids
    assert len(out) == len(expected_ids)

    for d in hist & planted:
        assert status[d + dedup.INC_HIST_OFFSET] == "dup_historical", d
    for d in fresh & planted:
        assert status[d + dedup.INC_BATCH_OFFSET] == "dup_in_batch", d
        assert status[d] == "kept", d
    # genuine unique batch docs are kept
    for d in fresh - planted:
        assert status[d] == "kept", d


def test_incremental_dedup_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = dedup.incremental_dedup(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(dedup.sql_incremental_dedup()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
