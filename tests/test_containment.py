"""Containment near-dup pairs: planted containers verified at ~1.0
containment while provably missed by the resemblance threshold, orientation
contract, and DuckDB mirror equality on the sf0.001 fixture."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import dedup

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None))


def test_planted_containment(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = dedup.synthesize_containment_corpus(docs)
    out = dedup.containment_pairs(corpus).toPandas()
    assert len(out) > 0

    # every planted (base, base + OFFSET) pair must surface, oriented with
    # the base doc as containee, at containment ~1 (df-cut slack allowed)
    base_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    planted = []
    for d in base_ids:
        h = int(duckdb.sql(
            f"SELECT ('0x' || substr(md5('cn|' || '{d}'), 1, 4))::BIGINT"
        ).fetchone()[0])
        if h % dedup.CONTAIN_PLANT_MOD == 0:
            planted.append(str(int(d)))
    assert planted, "fixture must contain planted rows"

    got = {(r.containee, r.container): r for r in out.itertuples()}
    for d in planted:
        key = (d, str(int(d) + dedup.CONTAIN_OFFSET))
        assert key in got, f"planted pair {key} missing"
        r = got[key]
        assert r.containment >= 0.9
        # the whole point: resemblance alone would have missed it
        assert r.jaccard < dedup.JACCARD_MIN
        assert r.missed_by_resemblance

    # orientation: containee never has more grams than container by
    # construction (containment uses the smaller side's gram count)
    assert (out["containment"] <= 1.0 + 1e-9).all()


def test_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup.containment_pairs(
        dedup.synthesize_containment_corpus(docs)
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(dedup.sql_containment_pairs()).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
