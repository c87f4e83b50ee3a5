"""paragraph_dedup (CCNet per-paragraph exact dedup) and
duplicate_window_stats (Lee-et-al window-level duplicate-substring signal):
hand-checkable synthetic corpora + DuckDB mirror parity."""

import duckdb

from pdfextract_spark.functions.dedup import (
    duplicate_window_stats,
    sql_duplicate_window_stats,
)
from pdfextract_spark.functions.webclean import paragraph_dedup, sql_paragraph_dedup


def test_paragraph_dedup_keeps_first_occurrence(spark):
    web = spark.createDataFrame(
        [
            ("a", "unique one\nshared para\nunique two", 3),
            ("b", "shared para\nother text", 2),
            ("c", "shared para\nshared para", 2),  # intra-doc dup too
        ],
        "doc_id string, web_text string, n_lines int",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(web).collect()}
    # 'shared para' first occurs at (a, pos 1): a keeps everything
    assert out["a"]["n_kept"] == 3
    assert out["a"]["dedup_text"] == "unique one\nshared para\nunique two"
    # b loses the shared paragraph but keeps its own
    assert out["b"]["n_kept"] == 1
    assert out["b"]["dedup_text"] == "other text"
    # c is nothing but copies -> empty after dedup
    assert out["c"]["n_kept"] == 0
    assert out["c"]["dedup_text"] == ""
    assert out["c"]["n_paras"] == 2


def test_window_stats_hand_case(spark):
    # W=3: doc a and b share the 3-token window "x y z"; doc c is too short
    docs = spark.createDataFrame(
        [(1, "x y z q"), (2, "p x y z"), (3, "x y")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in duplicate_window_stats(docs, w=3).collect()
    }
    assert out["1"]["n_windows"] == 2  # 'x y z', 'y z q'
    assert out["1"]["n_dup_windows"] == 1  # 'x y z' also in doc 2
    assert out["1"]["dup_per_mille"] == 500
    assert out["2"]["n_dup_windows"] == 1
    assert out["3"]["n_windows"] == 0 and out["3"]["dup_per_mille"] == 0


def test_window_stats_self_repetition_counts_once(spark):
    # a window repeated INSIDE one doc only: per-doc distinct windows mean
    # df stays 1 -> not counted as a cross-corpus dup
    docs = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    row = duplicate_window_stats(docs, w=3).collect()[0]
    assert row["n_dup_windows"] == 0


def test_duckdb_mirrors_on_real_corpus(spark):
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    from pdfextract_spark.functions.webclean import synthesize_web

    a = sorted(map(tuple, paragraph_dedup(synthesize_web(docs)).collect()))
    b = sorted(tuple(r) for r in con.execute(sql_paragraph_dedup()).fetchall())
    assert a == b

    a = sorted(map(tuple, duplicate_window_stats(docs).collect()))
    b = sorted(
        tuple(r) for r in con.execute(sql_duplicate_window_stats()).fetchall()
    )
    assert a == b
