"""Edit-distance verification of near-dup candidates: kernel semantics on
hand-built pairs, planted pass/fail separation, banded -1 contract, DuckDB
mirror equality."""

import duckdb
import pandas as pd

from pdfextract_spark.functions import dedup


def _verify(spark, rows):
    """Run edit_verify_pairs over hand-built (doc_id, text) docs and the
    full upper-triangle pair set."""
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    ids = sorted(r[0] for r in rows)
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for i, a in enumerate(ids) for b in ids[i + 1 :]],
        "doc_a string, doc_b string, jaccard_est double",
    )
    out = dedup.edit_verify_pairs(pairs, docs).toPandas()
    return {(r.doc_a, r.doc_b): r for r in out.itertuples()}


def test_kernel_semantics(spark):
    base = "the quick brown fox jumps over the lazy dog " * 10  # 440 chars
    rows = [
        ("1", base),
        ("2", base),  # identical -> sim 1000
        ("3", base + " rev2 edit"),  # light edit -> verified
        ("4", base[:220] + base[:220].upper()),  # rewritten tail -> fail
    ]
    v = _verify(spark, rows)
    assert v[("1", "2")].edit_sim_milli == 1000
    assert v[("1", "2")].edit_dist == 0
    assert v[("1", "2")].verified
    assert v[("1", "3")].verified
    assert v[("1", "3")].edit_dist > 0
    # the chimera's tail window is rewritten: banded DP gives up at the cap
    assert not v[("1", "4")].verified
    assert v[("1", "4")].edit_dist == -1
    assert v[("1", "4")].edit_sim_milli == 0


def test_threshold_boundary(spark):
    # docs under EDIT_KEY_CHARS so key == text: exactly 20% edits = sim
    # exactly 800 -> verified; one more edit -> 796 -> not verified
    base = "a" * 250
    rows = [
        ("1", base),
        ("2", "b" * 50 + "a" * 200),
        ("3", "b" * 51 + "a" * 199),
    ]
    v = _verify(spark, rows)
    assert v[("1", "2")].edit_sim_milli == 800 and v[("1", "2")].verified
    assert v[("1", "3")].edit_sim_milli < 800 and not v[("1", "3")].verified


def test_ascii_projection(spark):
    # non-ASCII chars are projected out before the distance, so a doc that
    # differs only in combining accents verifies with edit_dist 0
    rows = [("1", "héllo wörld " * 30), ("2", "hllo wrld " * 30)]
    v = _verify(spark, rows)
    assert v[("1", "2")].edit_dist == 0 and v[("1", "2")].verified


def test_planted_separation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup.edit_verified_neardups(docs).toPandas()
    a = pd.to_numeric(out.doc_a)
    b = pd.to_numeric(out.doc_b)
    hi = pd.concat([a, b], axis=1).max(axis=1)
    lo = pd.concat([a, b], axis=1).min(axis=1)
    near = out[
        (hi >= dedup.EV_NEAR_OFFSET)
        & (hi < dedup.EV_CHIM_OFFSET)
        & (hi - dedup.EV_NEAR_OFFSET == lo)
    ]
    chim = out[(hi >= dedup.EV_CHIM_OFFSET) & (hi - dedup.EV_CHIM_OFFSET == lo)]
    # both planted classes surface as candidates at fixture scale
    assert len(near) > 0 and len(chim) > 0
    # light edits always verify; chimeras never do
    assert near.verified.all()
    assert not chim.verified.any()


def test_mirror(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sp = dedup.edit_verified_neardups(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    du = con.sql(dedup.sql_edit_verified_neardups()).df()
    key = ["doc_a", "doc_b"]
    sp = sp.sort_values(key).reset_index(drop=True)
    du = du.sort_values(key).reset_index(drop=True)
    assert len(sp) == len(du)
    for c in ["doc_a", "doc_b", "edit_dist", "edit_sim_milli", "verified"]:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
