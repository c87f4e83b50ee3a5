"""MATTR lexical diversity: length-invariance (the property plain TTR
lacks), hand-computed window values, short-doc fallback, hapax census, and
DuckDB mirror equality."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import textops

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def test_hand_computed_and_fallback(spark):
    rows = [
        # tokens a b c b c a, w=3: windows (a,b,c)=3 (b,c,b)=2 (c,b,c)=2
        # (b,c,a)=3 -> sum 10 over denom 3*4 -> mattr 833; ttr 3/6 = 500;
        # every type repeats -> hapax 0
        ("1", "a b c b c a"),
        # short doc (2 < w): fallback to whole-doc TTR, n_windows = 1
        ("2", "x x"),
        # hapax: y z y -> types {y, z}, z occurs once -> hapax 500
        ("3", "y z y"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in textops.mattr_diversity(df, w=3).toPandas().to_dict("records")
    }
    assert out["1"]["n_tokens"] == 6 and out["1"]["ttr_milli"] == 500
    assert out["1"]["mattr_milli"] == 833 and out["1"]["n_windows"] == 4
    assert out["1"]["hapax_milli"] == 0
    assert out["2"]["n_windows"] == 1 and out["2"]["mattr_milli"] == 500
    assert out["3"]["hapax_milli"] == 500


def test_length_invariance_vs_ttr(spark):
    # the same vocabulary pattern repeated: TTR collapses with length,
    # MATTR stays put — the reason the operator exists
    unit = "alpha beta gamma delta epsilon"
    rows = [("s", unit), ("l", " ".join([unit] * 20))]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in textops.mattr_diversity(df, w=5).toPandas().to_dict("records")
    }
    assert out["l"]["ttr_milli"] < out["s"]["ttr_milli"] // 10
    assert abs(out["l"]["mattr_milli"] - out["s"]["mattr_milli"]) <= 1


def test_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = textops.mattr_diversity(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(textops.sql_mattr_diversity()).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)


def test_zero_shuffle_plan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        textops.mattr_diversity(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]
