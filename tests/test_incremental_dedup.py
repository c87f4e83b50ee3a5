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


def test_runtime_bloom_prefilter_needs_stored_fingerprints(spark, tmp_path):
    """The production history layout stores the fingerprint as a physical
    column: Spark's InjectRuntimeFilter then builds bloom_filter_agg over
    the (selective) batch fingerprints and prefilters the history SCAN
    before the shuffle — the plan feature that keeps a 10^12-row history
    from shipping wholesale. Deriving md5(text) inside the join defeats the
    rule (it can't track a computed key down to the scan), so this test
    pins BOTH facts: bloom injected for the stored layout, and results
    identical with the filter on and off."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), fp.alias("fingerprint"))
    hist_path = str(tmp_path / "hist.parquet")
    batch_path = str(tmp_path / "batch.parquet")
    base.filter(F.col("doc_id") % 10 < 6).write.parquet(hist_path)
    base.filter(F.col("doc_id") % 10 >= 6).write.parquet(batch_path)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hist = spark.read.parquet(hist_path)
        # a selective batch-side predicate is what makes the rule fire
        batch = spark.read.parquet(batch_path).filter(F.col("doc_id") % 3 == 0)
        out = dedup.incremental_dedup_tables(hist, batch)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:3000]
        with_bloom = _value_hash(out.toPandas())

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        out2 = dedup.incremental_dedup_tables(hist, batch)
        plan2 = out2._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" not in plan2
        assert _value_hash(out2.toPandas()) == with_bloom
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dup_weighted_sample_properties(spark):
    from pdfextract_spark.functions import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = dedup.synthesize_dup_corpus(docs)
    out = dedup.dup_weighted_sample(corpus).toPandas()
    # one row per content cluster, keepers are originals (smallest id)
    assert len(out) == docs.count()
    assert (out.keeper_doc_id < dedup.DWS_COPY_OFFSET).all()
    # planted weights: 1 (untouched), 2 (1-copy plant), 4 (3-copy plant);
    # both plant classes exist at this sf
    assert set(out.weight.unique()) <= {1, 2, 4}
    assert (out.weight >= 2).any() and (out.weight == 4).any()
    # upweighting: p_milli = min(1000, rate*weight); weight-4 clusters are
    # certain keeps, so every one of them must be sampled
    assert (out.p_milli == (out.weight * dedup.DWS_RATE_MILLI).clip(upper=1000)).all()
    assert out[out.weight == 4].sampled.all()
    # weight-1 keep rate is near the base rate (coin is uniform on md5)
    w1 = out[out.weight == 1]
    assert abs(w1.sampled.mean() - dedup.DWS_RATE_MILLI / 1000) < 0.08
    # deterministic across runs
    again = dedup.dup_weighted_sample(corpus).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, again.values.tolist())
    )
