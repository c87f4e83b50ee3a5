"""Per-domain quota sampling (C4/RefinedWeb anti-domination cap).

Contracts:
- no domain keeps more than DOMAIN_CAP docs; every domain with <= cap docs
  keeps all of them;
- determinism + nesting: cap=2's survivors are a strict subset of cap=4's
  (the md5-priority property that makes the cut reproducible across runs,
  retries and cluster sizes);
- scale: the physical plan contains a WindowGroupLimit — Spark 3.5+
  recognizes the rank<=cap filter and inserts a map-side partial top-cap
  per domain BEFORE the exchange, so a mega-domain ships only cap rows per
  map task (the skew bound the docstring claims);
- Spark == DuckDB on the full (doc_id, domain, rank_in_domain) relation.
"""

import hashlib

import duckdb
import pandas as pd

from pdfextract_spark.functions import webclean

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


def test_domain_cap_quota_and_nesting(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out4 = webclean.domain_cap(docs, cap=4).toPandas()
    out2 = webclean.domain_cap(docs, cap=2).toPandas()

    sizes = out4.groupby("domain").size()
    assert (sizes <= 4).all(), sizes[sizes > 4]
    assert (out4.rank_in_domain <= 4).all()
    assert (out4.rank_in_domain >= 1).all()

    # a domain with fewer docs than the cap loses nothing
    all_dom = webclean.domain_cap(docs, cap=10**9).toPandas()
    full = all_dom.groupby("domain").size()
    for dom, n in full.items():
        assert sizes.get(dom, 0) == min(n, 4), (dom, n, sizes.get(dom))

    # nesting: the cap=2 cut is exactly cap=4's rank<=2 prefix
    kept2 = set(out2.doc_id)
    prefix = set(out4[out4.rank_in_domain <= 2].doc_id)
    assert kept2 == prefix


def test_domain_cap_plan_has_window_group_limit(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        webclean.domain_cap(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_domain_cap_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sp = webclean.domain_cap(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = con.sql(webclean.sql_domain_cap()).df()
    assert len(sp) == len(du)
    assert sorted(sp.columns) == sorted(du.columns)
    assert _value_hash(sp) == _value_hash(du)
