"""Skew-aware shard plan: planted heavy hosts land on dedicated shards in
load order, conservation across shards, the pigeonhole candidate bound,
and DuckDB mirror equality (uniform AND skewed corpus)."""

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from pdfextract_spark.functions import packing
from pdfextract_spark.functions.graphops import _host_of

SF_DIR = "/root/testdata/sf0.001"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_planted_heavy_hosts_dedicated(spark):
    docs = packing.synthesize_skewed_hosts(_docs(spark))
    out = packing.shard_plan(docs).toPandas()
    ded = out[out["kind"] == "dedicated"].sort_values("shard")
    # SKEW_HOST_A (600 fillers/doc) outweighs SKEW_HOST_B (300): rank order
    assert list(ded["shard"]) == [packing.SHARD_N, packing.SHARD_N + 1]
    assert ded["n_hosts"].tolist() == [1, 1]
    loads = ded["load_tokens"].tolist()
    assert loads[0] > loads[1]

    # the dedicated hosts are exactly the planted ones
    hosts = (
        docs.select(_host_of(F.col("doc_id").cast("string")).alias("h"))
        .groupBy("h")
        .count()
        .toPandas()
    )
    assert packing.SKEW_HOST_A in set(hosts["h"])

    # conservation: shard loads partition the corpus token mass
    toks = docs.select(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        ).alias("t")
    ).collect()[0]["t"]
    assert int(out["load_tokens"].sum()) == int(toks)
    assert int(out["n_hosts"].sum()) == int(
        docs.select(_host_of(F.col("doc_id").cast("string"))).distinct().count()
    )


def test_uniform_corpus_has_no_dedicated_shard(spark):
    out = packing.shard_plan(_docs(spark)).toPandas()
    assert (out["kind"] == "hashed").all()
    # every hashed shard id is inside the hash range
    assert out["shard"].between(0, packing.SHARD_N - 1).all()


def test_pigeonhole_candidate_bound(spark):
    # heavy candidates (load*DENOM >= total) can never exceed DENOM rows
    docs = packing.synthesize_skewed_hosts(_docs(spark))
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    census = (
        docs.select(_host_of(F.col("doc_id").cast("string")).alias("host"), toks.alias("t"))
        .groupBy("host")
        .agg(F.sum("t").alias("load"))
    )
    total = census.agg(F.sum("load")).collect()[0][0]
    n_cand = census.filter(
        F.col("load") * packing.SHARD_HEAVY_DENOM >= F.lit(int(total))
    ).count()
    assert n_cand <= packing.SHARD_HEAVY_DENOM


def test_duckdb_mirror_uniform_and_skewed(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    # uniform
    out = packing.shard_plan(_docs(spark)).toPandas()
    oracle = con.execute(packing.sql_shard_plan()).fetchdf()
    assert _hash(out) == _hash(oracle)
    # skewed (the driver-gated composition)
    out = packing.shard_plan(packing.synthesize_skewed_hosts(_docs(spark))).toPandas()
    oracle = con.execute(
        packing.sql_shard_plan(table=f"({packing.sql_synthesize_skewed_hosts()})")
    ).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
