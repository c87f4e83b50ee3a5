"""Per-source data card: planted duplicates move dup_milli exactly,
entropy brackets (0 for monolingual, log2(k) q4 for uniform k langs),
median from the histogram cumsum, and DuckDB mirror equality."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import curation

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def test_entropy_and_dup_brackets(spark):
    rows = [
        # source 'm': monolingual, no dups -> entropy 0, dup 0
        ("1", "the cat sat on the mat today", "en", "m"),
        ("2", "a dog ran over the hill fast", "en", "m"),
        # source 'u': two docs, two langs, uniform -> entropy = 1 bit = 16 q4
        ("3", "one two three four five six", "en", "u"),
        ("4", "uno dos tres cuatro cinco seis", "es", "u"),
        # source 'd': 2 of 4 docs share a text -> dup_milli = 250
        ("5", "alpha beta gamma delta words here", "en", "d"),
        ("6", "alpha beta gamma delta words here", "en", "d"),
        ("7", "different text entirely for this one", "en", "d"),
        ("8", "and another unique document right here", "en", "d"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string"
    )
    out = {r["source"]: r for r in curation.datacard(df).toPandas().to_dict("records")}
    assert out["m"]["lang_entropy_q4"] == 0 and out["m"]["dup_milli"] == 0
    assert out["u"]["lang_entropy_q4"] == 16  # 1 bit, exact in q4
    assert out["d"]["dup_milli"] == 250
    assert out["m"]["n_langs"] == 1 and out["u"]["n_langs"] == 2
    # median: source m docs are 7 and 7 tokens -> p50 = 7
    assert out["m"]["tokens_p50"] == 7


def test_planted_dups_move_the_card(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clean = curation.datacard(docs).toPandas()
    planted = curation.datacard(
        curation.synthesize_datacard_corpus(docs)
    ).toPandas()
    assert (clean["dup_milli"] == 0).all()
    assert (planted["dup_milli"] > 0).any()
    # volume grows by exactly the planted copies
    assert planted["n_docs"].sum() > clean["n_docs"].sum()


def test_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curation.datacard(curation.synthesize_datacard_corpus(docs)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(
        curation.sql_datacard(
            table=f"({curation.sql_synthesize_datacard_corpus()})"
        )
    ).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
