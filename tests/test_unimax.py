"""UniMax language sampling: all three allocation regimes exercised on the
fixture (cap-bound, budget-bound water-filled, downsampled head), budget
conservation, the epoch-cap invariant, and DuckDB mirror equality."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import curation

SF_DIR = "/root/testdata/sf0.01"


def _hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    return sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def _out(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return curation.unimax_sample(docs).toPandas()


def test_three_regimes_and_cap_invariant(spark):
    out = _out(spark)
    cap_milli = curation.UNIMAX_EPOCH_CAP * 1000
    # the cap is never exceeded, and capped langs sit exactly on it
    assert (out["epochs_milli"] <= cap_milli).all()
    assert (out.loc[out["capped"], "epochs_milli"] == cap_milli).all()
    # all three regimes present on this fixture: the low-resource tail is
    # cap-bound, the mid langs water-fill below the cap, the 'en' head is
    # DOWNsampled (below one epoch) — the behavior temperature sampling
    # can only approximate with the right alpha
    assert out["capped"].any()
    assert ((~out["capped"]) & (out["epochs_milli"] >= 1000)).any()
    head = out[out["lang"] == "en"].iloc[0]
    assert not head["capped"] and head["epochs_milli"] < 1000


def test_budget_conservation(spark):
    out = _out(spark)
    budget = int(out["n_tokens"].sum()) * curation.UNIMAX_BUDGET_X
    spent = int(out["alloc_tokens"].sum())
    assert spent <= budget
    # the walk spends the whole budget whenever the LAST (highest-resource)
    # language is uncapped: its step is alloc = b_rem div 1, exactly
    last = out.sort_values(["n_tokens", "lang"]).iloc[-1]
    if not last["capped"]:
        assert spent == budget


def test_schedule_arithmetic(spark):
    out = _out(spark)
    # full_epochs/residual decompose the allocation exactly
    assert (
        out["full_epochs"] * out["n_tokens"]
        + (out["residual_pm"] * out["n_tokens"]) // 1000
        <= out["alloc_tokens"]
    ).all()
    assert (out["kept_docs"] <= out["n_docs"]).all()
    assert (
        out["sampled_docs"]
        == out["full_epochs"] * out["n_docs"] + out["kept_docs"]
    ).all()


def test_duckdb_mirror(spark):
    out = _out(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(curation.sql_unimax_sample()).fetchdf()
    assert sorted(out.columns) == sorted(oracle.columns)
    assert _hash(out) == _hash(oracle)
