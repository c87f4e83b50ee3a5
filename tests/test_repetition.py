"""Hand-computed pins for the Gopher repetition signals (the corpus-wide
Spark↔DuckDB parity runs in test_oracle_queries via sql_repetition_stats)."""

import duckdb

from pdfextract_spark.functions.textops import repetition_stats, sql_repetition_stats

CASES = [
    # text, top_bigram_count, top_bigram_frac, dup_trigram_frac
    ("a b a b a b", 3, 0.6, 1.0),  # 'a b' x3 of 5 bigrams; all 4 trigrams dup
    ("x y z", 1, 0.5, 0.0),  # no repetition
    ("solo", 0, 0.0, 0.0),  # too short for any gram
    ("w w", 1, 1.0, 0.0),
    # bigrams (8): 'p q' x3, 'q r' x2, 'r p' x2, 'q s' -> top 3, 3/8
    # trigrams (7): p-q-r x2, q-r-p x2, r-p-q x2, p-q-s x1 -> 6 dup members of 7
    ("p q r p q r p q s", 3, 0.375, round(6 / 7, 4)),
]


def test_spark_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, (text, topc, topf, dupf) in enumerate(CASES):
        r = rows[i]
        assert r["top_bigram_count"] == topc, text
        assert abs(r["top_bigram_frac"] - topf) < 1e-9, text
        assert abs(r["dup_trigram_frac"] - dupf) < 1e-9, text


def test_duckdb_oracle_hand_cases():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, (t, *_) in enumerate(CASES):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    rows = {r[0]: r for r in con.execute(sql_repetition_stats()).fetchall()}
    for i, (text, topc, topf, dupf) in enumerate(CASES):
        assert rows[i][1] == topc, text
        assert abs(rows[i][2] - topf) < 1e-9, text
        assert abs(rows[i][3] - dupf) < 1e-9, text
