"""CCNet perplexity bucketing (head/middle/tail terciles).

Contracts:
- every doc gets exactly one bucket; head scores <= every middle score <=
  every tail score (the bucket rule is a pure threshold on the score);
- terciles are approximately equal (within the mass of one boundary score
  value — ties land in the lower bucket by the exact integer rule);
- Spark == DuckDB on the full (doc_id, mean_surprisal_q4, ppl_bucket)
  relation.
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


def test_ppl_buckets_threshold_rule(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = textops.ppl_buckets(docs).toPandas()
    ppl = textops.unigram_perplexity(docs).toPandas()
    assert len(out) == len(ppl)
    assert set(out.ppl_bucket) <= {"head", "middle", "tail"}

    by = {b: g.mean_surprisal_q4 for b, g in out.groupby("ppl_bucket")}
    if "head" in by and "middle" in by:
        assert by["head"].max() < by["middle"].min()
    if "middle" in by and "tail" in by:
        assert by["middle"].max() < by["tail"].min()

    # approximately-equal terciles: each bucket's count is within one
    # boundary-score tie mass of N/3
    n = len(out)
    counts = out.groupby("ppl_bucket").size()
    score_mass = out.groupby("mean_surprisal_q4").size().max()
    for b in counts.index:
        assert abs(counts[b] - n / 3) <= score_mass, (b, counts[b], n)


def test_ppl_buckets_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = textops.ppl_buckets(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(textops.sql_ppl_buckets()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
