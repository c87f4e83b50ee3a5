"""Content-defined chunk dedup: the property that justifies the kernel
(boundaries derived from content, so an insertion perturbs only the chunk
it lands in — FastCDC/LBFS applied to token streams) plus the plan-shape
budget (one census Exchange, no inferred scan filter re-expanding the
chunk pipeline)."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.dedup import (
    CDC_DIVISOR,
    cdc_chunk_dedup,
    sql_cdc_chunk_dedup,
)

WORDS = [f"w{i}" for i in range(400)]
BASE = " ".join(WORDS)
# same passage shifted by an insertion near the front: every chunk after
# the perturbed one must still hash identically
SHIFTED = " ".join(["INSERTED"] + WORDS)


@pytest.fixture(scope="module")
def pair(spark):
    return spark.createDataFrame(
        [("0", BASE), ("1", SHIFTED)], "doc_id string, text string"
    )


def _chunks(spark, text):
    df = spark.createDataFrame([("0", text), ("1", text)], "doc_id string, text string")
    out = cdc_chunk_dedup(df).select("chunk_hash", "chunk_chars").collect()
    return {(r.chunk_hash, r.chunk_chars) for r in out}


def test_shift_robust_chunks(spark, pair):
    """All but O(1) chunks survive a front-of-document insertion."""
    base = _chunks(spark, BASE)
    shifted = _chunks(spark, SHIFTED)
    shared = base & shifted
    # the insertion lands in exactly one chunk; every other chunk boundary
    # is content-derived and therefore unchanged
    assert len(shared) >= len(base) - 1
    assert len(base - shifted) <= 1


def test_chunk_census_counts(spark, pair):
    out = cdc_chunk_dedup(pair).collect()
    # both docs share the w0..w399 chunk stream -> duplicated chunks exist
    assert len(out) > 10
    for r in out:
        assert r.n_occurrences >= 2
        assert r.keeper_doc in (0, 1)
    # keeper is min(doc_id): every shared chunk keeps doc 0
    shared = [r for r in out if r.n_docs == 2]
    assert shared and all(r.keeper_doc == 0 for r in shared)


def test_chunk_lengths_track_divisor(spark):
    """Expected chunk length ~= divisor tokens (geometric boundary rule)."""
    df = spark.createDataFrame(
        [("0", BASE), ("1", BASE)], "doc_id string, text string"
    )
    out = cdc_chunk_dedup(df).collect()
    n_chunks = sum(r.n_occurrences for r in out) / 2
    # 400 tokens / divisor-token expected chunks, loose 3x band
    assert 400 / (3 * CDC_DIVISOR) <= n_chunks <= 3 * 400 / CDC_DIVISOR


def test_plan_shape(spark, pair):
    plan = cdc_chunk_dedup(pair)._jdf.queryExecution().executedPlan().toString()
    # census budget: exact countDistinct(doc_id) expands to a two-level
    # aggregate, so the census costs TWO keyed shuffles (chunk_hash+doc_id,
    # then chunk_hash), both map-side-combined — pinned here
    assert plan.count("Exchange hashpartitioning") == 2, plan[:1200]
    # the generator trap: no scan-level Filter may re-expand the chunk
    # pipeline (a pushed size()>0 gate would mention array_join there)
    scan_filters = [
        ln for ln in plan.splitlines() if "Filter" in ln and "array_join" in ln
    ]
    assert not scan_filters, scan_filters
    # the O(n^2) trap: the boundary filter lambda must not contain a whole-
    # array transform (per-element md5 only — see cdc_chunk_dedup docstring)
    import re

    for m in re.finditer(r"filter\(sequence[^\n]*", plan):
        assert "transform(" not in m.group(0), m.group(0)[:400]


def test_sql_mirror_runs(spark, pair):
    import duckdb

    pdf = pair.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    odf = con.execute(sql_cdc_chunk_dedup()).df()
    sdf = cdc_chunk_dedup(pair).toPandas()
    assert len(odf) == len(sdf)
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    assert a.equals(b)
