"""Contamination attribution: planted leaks surface as top-ranked
attributions with the passage's gram count, the salted two-stage top-k is
salt-invariant (exactness), and the DuckDB mirror agrees bit-exactly."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import decontam

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def _split(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return decontam.synthesize_eval_split(docs)


def test_planted_attribution(spark):
    split = _split(spark)
    out = decontam.contamination_attribution(split).toPandas()
    assert len(out) > 0
    # the passage is PASSAGE_WORDS long -> PASSAGE_WORDS - NGRAM + 1
    # internal grams shared by every planted train doc with every bench
    # item; rank-1 attributions must carry at least that many
    n_passage_grams = len(decontam.PASSAGE.split()) - decontam.NGRAM + 1
    top = out[out["rank"] == 1]
    assert (top["shared_grams"] >= n_passage_grams).all()
    assert (top["coverage_milli"] > 0).all()
    # ranks are dense 1..k per bench item and ordered by shared desc
    for _, g in out.groupby("bench_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert list(g["shared_grams"]) == sorted(g["shared_grams"], reverse=True)


def test_salt_invariance(spark):
    split = _split(spark)
    outs = [
        _hash(decontam.contamination_attribution(split, salt=s).toPandas())
        for s in (1, 8, 32)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_duckdb_mirror(spark):
    out = decontam.contamination_attribution(_split(spark)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(decontam.sql_contamination_attribution()).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
