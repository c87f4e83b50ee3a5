"""DoReMi-style domain reweighting: hardness-proportional weights, budget
spend, sampler composition, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import curation


def _mirror(sp, sql, sf="sf0.001"):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'/root/testdata/{sf}/documents.parquet'"
    )
    du = con.sql(sql).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))


def test_doremi_upweights_hard_domain(spark):
    # "easy" domain reuses the corpus head vocabulary (low surprisal under
    # the corpus-trained LM); "hard" domain is unique gibberish tokens
    # (every token OOV -> max surprisal). DoReMi-lite must give hard a
    # weight ABOVE its token share and easy a weight BELOW its share.
    rows = []
    for i in range(40):
        rows.append((i, "the a of and to in is on for with", "easy"))
    for i in range(40, 60):
        toks = " ".join(f"zq{i}x{j}" for j in range(10))
        rows.append((i, toks, "hard"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = curation.doremi_weights(docs).toPandas().set_index("source")
    total = w.toks_src.sum()
    share = {s: 1000 * w.loc[s].toks_src // total for s in ("easy", "hard")}
    assert w.loc["hard"].weight_milli > share["hard"]
    assert w.loc["easy"].weight_milli < share["easy"]
    assert w.loc["hard"].mean_surprisal_q4 > w.loc["easy"].mean_surprisal_q4
    # floor keeps the easiest domain alive
    assert w.loc["easy"].excess_q4 == curation.DRM_EXCESS_FLOOR_Q4
    assert w.loc["easy"].weight_milli > 0


def test_doremi_weights_arithmetic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = curation.doremi_weights(docs).toPandas()
    # per-mille weights sum to <=1000 (floor rounding) and near it
    assert w.weight_milli.sum() <= 1000
    assert w.weight_milli.sum() >= 1000 - len(w)
    # target spend <= the global budget, rates consistent with targets
    budget = w.toks_src.sum() * curation.DRM_BUDGET_PCT // 100
    assert w.target_tokens.sum() <= budget
    assert (
        w.rate_pm
        == (w.target_tokens * 1000 // w.toks_src).clip(upper=1000)
    ).all()


def test_doremi_sample_respects_rates(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = curation.doremi_sample(docs).toPandas()
    w = curation.doremi_weights(docs).toPandas().set_index("source")
    assert len(kept) > 0
    for src, grp in kept.groupby("source"):
        assert (grp.rate_pm == w.loc[src].rate_pm).all()
    # deterministic: a second run keeps the identical doc set
    again = curation.doremi_sample(docs).toPandas()
    assert set(kept.doc_id) == set(again.doc_id)


def test_doremi_mirrors(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _mirror(
        curation.doremi_weights(docs).toPandas(),
        curation.sql_doremi_weights(),
    )
    _mirror(
        curation.doremi_sample(docs).toPandas(),
        curation.sql_doremi_sample(),
    )
