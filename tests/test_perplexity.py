"""Unigram-LM perplexity quality filter (round-3 verdict task 7 — CCNet's
model-based half next to the Gopher rule gates).

Contracts:
- Spark == DuckDB on the full (doc_id, n_tokens, mean_surprisal_q4,
  ppx_flag) relation at sf0.001 — the integer fixed-point log2 is the whole
  point: no float log anywhere, so the driver's value-hash gate holds;
- the fixed-point surprisal tracks true log2 within its documented error
  bound on exact constructed ratios;
- ordering sanity: a document of corpus-common tokens scores strictly lower
  mean surprisal than a document of corpus-unique tokens;
- OOV (beyond-vocabulary) tokens score as count-OOV_COUNT events (the
  worst-case surprisal), so gibberish-heavy docs land in the flagged tail.
"""

import hashlib
import math

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


def test_spark_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = textops.unigram_perplexity(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = con.sql(textops.sql_unigram_perplexity()).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def _surprisal16_py(c: int, t: int) -> int:
    """Pure-python replica of the documented integer formula."""
    q = (t * textops.LM_PRESCALE) // c
    e0 = q.bit_length() - 1
    m16 = (q * 16) >> e0
    return 16 * e0 + m16 - 16 - 16 * (textops.LM_PRESCALE.bit_length() - 1)


def test_fixed_point_tracks_log2():
    # worst-case error: linear-mantissa bias <= 0.0861 bits + 4-bit mantissa
    # floor <= log2(17/16) ~ 0.0875 bits + ratio quantization <= ~0.0014
    # bits => |s16/16 - log2(T/c)| <= 0.175
    for c, t in [(1, 10), (3, 1000), (7, 12345), (999, 1000), (1, 1)]:
        s16 = _surprisal16_py(c, t)
        true_bits = math.log2(t / c)
        assert abs(s16 / 16.0 - true_bits) <= 0.175, (c, t, s16, true_bits)


def test_common_vs_rare_ordering(spark):
    rows = [(str(i), "the common token stream " * 10) for i in range(20)]
    rows.append(("rare", " ".join(f"zq{i}x" for i in range(40))))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = textops.unigram_perplexity(docs).toPandas().set_index("doc_id")
    common_scores = out.drop(index="rare")["mean_surprisal_q4"]
    assert (out.loc["rare", "mean_surprisal_q4"] > common_scores).all()


def test_oov_scores_as_singletons(spark):
    # corpus big enough that the vocab cap bites: tokens beyond the top
    # VOCAB_CAP by count fall back to OOV_COUNT and must score >= any
    # in-vocabulary token with count >= 2
    n = textops.VOCAB_CAP + 50
    # 'aa...' tokens appear twice (in vocab), 'zz...' tokens once (tail)
    rows = [("d0", " ".join(f"a{i}" for i in range(n)) * 2)]
    rows.append(("d1", " ".join(f"z{i}" for i in range(60))))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = textops.unigram_perplexity(docs).toPandas().set_index("doc_id")
    assert out.loc["d1", "mean_surprisal_q4"] > out.loc["d0", "mean_surprisal_q4"]
