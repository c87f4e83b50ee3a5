"""Mirror-host detection: the planted full mirror surfaces at jaccard
1000, the planted partial mirror behaves as a threshold control, clean
hosts never pair, and the DuckDB mirror agrees bit-exactly."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import graphops

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def _hosted(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return graphops.synthesize_mirror_hosts(docs)


def test_full_mirror_found_clean_hosts_silent(spark):
    out = graphops.mirror_hosts(_hosted(spark)).toPandas()
    full = out[(out.host_a == "h3") & (out.host_b == "m3")]
    assert len(full) == 1
    assert full.iloc[0]["jaccard_milli"] == 1000
    assert full.iloc[0]["shared"] == full.iloc[0]["n_a"] == full.iloc[0]["n_b"]
    # fixture texts are unique per doc: no un-planted host pair can clear
    # the gate
    others = out[~out.host_b.isin(["m3", "p7"])]
    assert len(others) == 0


def test_partial_mirror_threshold_control(spark):
    hosted = _hosted(spark)
    strict = graphops.mirror_hosts(hosted).toPandas()
    assert not ((strict.host_a == "h7") & (strict.host_b == "p7")).any()
    loose = graphops.mirror_hosts(hosted, min_milli=100).toPandas()
    part = loose[(loose.host_a == "h7") & (loose.host_b == "p7")]
    assert len(part) == 1
    # the partial mirror's fingerprints are a strict subset of h7's
    r = part.iloc[0]
    assert r["shared"] == r["n_b"] and r["n_b"] < r["n_a"]
    assert 0 < r["jaccard_milli"] < 1000


def test_duckdb_mirror(spark):
    out = graphops.mirror_hosts(_hosted(spark)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(graphops.sql_mirror_hosts()).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
