"""End-to-end curation chain (the hygiene job's stage order as one
driver-gated flag relation).

Contracts:
- keep == ok_quality AND NOT ppx_flag AND is_keeper AND sampled, row-wise;
- every planted duplicate ('d'-prefixed doc_id) is flagged non-keeper and
  its original is a keeper (the plant exercises the dedup stage the
  fixture's unique texts never would);
- Spark == DuckDB on the full 8-column relation.
"""

import hashlib

import duckdb
import pandas as pd

from pdfextract_spark.functions import curation

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


def test_curation_keep_rule_and_planted_dups(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curation.curation_flags(docs).toPandas()

    expect = out.ok_quality & ~out.ppx_flag & out.is_keeper & out.sampled
    assert (out.keep == expect).all()

    planted = out[out.doc_id.str.startswith("d")]
    assert len(planted) > 0
    assert (~planted.is_keeper).all()
    originals = set(planted.doc_id.str[1:])
    orig_rows = out[out.doc_id.isin(originals)]
    assert orig_rows.is_keeper.all()
    # non-planted docs are all keepers (the fixture itself has no dups)
    rest = out[~out.doc_id.isin({f"d{d}" for d in originals})]
    assert rest.is_keeper.all()


def test_curation_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = curation.curation_flags(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(curation.sql_curation_flags()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)


def test_curation_packed_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = curation.curation_packed(docs).toPandas()
    flags = curation.curation_flags(docs).toPandas()
    # exactly the keepers are packed, each once
    assert len(sp) == int(flags.keep.sum())
    assert set(sp.doc_id) == set(flags[flags.keep].doc_id)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(curation.sql_curation_packed()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
