"""Per-document tf-idf keyword extraction.

Contracts:
- at most TFIDF_TOPK rows per doc, scores non-negative, deterministic
  tie-break (score desc, token asc);
- a corpus-rare token outranks a corpus-universal one at equal tf (the idf
  property on a hand-built corpus);
- the per-doc top-k plans through WindowGroupLimit (map-side partial top-k
  before the doc_id exchange);
- Spark == DuckDB on the full (doc_id, token, tf, tfidf_q4) relation.
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


def test_tfidf_topk_shape_and_rarity(spark):
    docs = spark.createDataFrame(
        [
            ("1", "common rare common zebra"),
            ("2", "common common common common"),
            ("3", "common zebra"),
        ],
        "doc_id string, text string",
    )
    out = textops.tfidf_topk(docs, topk=2).toPandas()
    assert (out.groupby("doc_id").size() <= 2).all()
    assert (out.tfidf_q4 >= 0).all()
    # 'common' appears in every doc -> idf16 = 0 -> score 0; 'rare' (df=1)
    # must outrank it in doc 1 despite tf 1 vs 2
    d1 = out[out.doc_id == "1"].sort_values("tfidf_q4", ascending=False)
    assert d1.iloc[0].token == "rare"
    # universal token scores exactly 0
    assert out[out.token == "common"].tfidf_q4.eq(0).all()


def test_tfidf_topk_plan_has_window_group_limit(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        textops.tfidf_topk(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_tfidf_topk_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = textops.tfidf_topk(docs).toPandas()
    assert (sp.groupby("doc_id").size() <= textops.TFIDF_TOPK).all()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(textops.sql_tfidf_topk()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
