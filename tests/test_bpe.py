"""BPE merge training: hand-derived merge tables on the classic low/lower
corpus, the overlap-semantics case, and tie-breaking — on BOTH engines
(corpus-wide Spark↔DuckDB parity runs in test_oracle_queries)."""

import duckdb
import pytest

from pdfextract_spark.functions.bpe import bpe_train_merges, sql_bpe_train_merges

# words: low x3, lower x2 (Sennrich et al.'s example, counts simplified)
LOW_DOCS = ["low low low", "lower lower"]
# rounds derived by hand:
# 1: (l,o) 5  -- ties (l,o)/(o,w) at 5 break on left ASC
# 2: (lo,w) 5
# 3: (low,</w>) 3
# 4: (e,r) 2  -- ties (low,e)/(e,r)/(r,</w>) at 2 break on left ASC
LOW_EXPECT = [
    (1, "l", "o", 5),
    (2, "lo", "w", 5),
    (3, "low", "</w>", 3),
    (4, "e", "r", 2),
]

# 'aaaa': pairs of [a,a,a,a,</w>] -> (a,a) x3; merging must be left-to-right
# NON-OVERLAPPING ([aa][aa], not [aa][a][a]) — pins the padded-string
# replace trick's fold semantics.
AAAA_EXPECT_R1 = (1, "a", "a", 3)


def _duck(docs, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(docs):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    return [tuple(r) for r in con.execute(sql_bpe_train_merges(k)).fetchall()]


def test_duckdb_low_lower():
    assert _duck(LOW_DOCS, 4) == LOW_EXPECT


def test_duckdb_overlap_semantics():
    got = _duck(["aaaa"], 2)
    assert got[0] == AAAA_EXPECT_R1
    # round 2: state [aa,aa,</w>] -> pairs (aa,aa) and (aa,</w>), both 1;
    # tie-break (left ASC, right ASC) picks (aa,</w>)
    assert got[1] == (2, "aa", "</w>", 1)


def test_spark_low_lower(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LOW_DOCS)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train_merges(df, 4).collect()]
    assert got == LOW_EXPECT


def test_spark_overlap_semantics(spark):
    df = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train_merges(df, 2).collect()]
    assert got[0] == AAAA_EXPECT_R1
    assert got[1] == (2, "aa", "</w>", 1)


# --------------------------------------------------------------- encoding
# low/lower corpus, 4 merges (LOW_EXPECT): vocabulary after training is
# {l,o,w,e,r,</w>,lo,low,low</w>,er}. Hand-derived encodings:
#   "low"   -> pad [l,o,w,</w>] -> lo -> low -> low</w>        = 1 token
#   "lower" -> [l,o,w,e,r,</w>] -> lo -> low -> (no low</w>) -> er
#            -> [low, er, </w>]                                 = 3 tokens
LOW_ENC_EXPECT = {
    # doc 0 = "low low low": 3 words x 1 token
    "0": (3, 3, "low</w>"),
    # doc 1 = "lower lower": 2 words x 3 tokens
    "1": (2, 6, "low er </w>"),
}


def test_spark_encode_low_lower(spark):
    from pdfextract_spark.functions.bpe import bpe_encode

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LOW_DOCS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens_bpe"], r["first_word_tokens"])
        for r in bpe_encode(df, 4).collect()
    }
    assert got == LOW_ENC_EXPECT


def test_duckdb_encode_low_lower():
    from pdfextract_spark.functions.bpe import sql_bpe_encode

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(LOW_DOCS):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(sql_bpe_encode(4)).fetchall()
    }
    assert got == LOW_ENC_EXPECT
