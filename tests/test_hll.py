"""HyperLogLog semantics: duplicate-insensitivity (the defining distinct-
count property), small-range linear-counting correction, accuracy bounds
at m=64, and determinism. Value-level DuckDB parity runs in the
parametrized oracle suite (sketch_hll_hosts)."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.sketches import (
    HLL_LC_TABLE,
    HLL_M,
    hll_host_distinct,
)


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


@pytest.fixture(scope="module")
def sketched(spark):
    return {r["host"]: r for r in hll_host_distinct(_docs(spark, 800)).collect()}


def test_duplicate_insensitive(spark, sketched):
    # the corpus unioned with itself (every doc twice) yields the IDENTICAL
    # sketch relation: max-per-register state only sees distinct hash values
    doubled = _docs(spark, 800).union(_docs(spark, 800))
    again = {r["host"]: r for r in hll_host_distinct(doubled).collect()}
    assert again == sketched


def test_estimates_track_exact(sketched):
    # m=64 gives ~13% relative error (1.04/sqrt(64)); allow generous slack
    # per host but require the aggregate to be tight
    errs = [r["err_permille"] for r in sketched.values()]
    assert max(errs) <= 600
    assert sum(errs) / len(errs) <= 300
    total_est = sum(r["hll_est"] for r in sketched.values())
    total_exact = sum(r["exact"] for r in sketched.values())
    assert abs(total_est - total_exact) * 1000 // total_exact <= 150


def test_small_range_correction(spark):
    # one host's worth of tiny corpora: with a handful of docs most
    # registers are empty -> the linear-counting path must engage and be
    # near-exact (lc[m-1] = round(m*ln(m/(m-1))) = 1)
    rows = hll_host_distinct(_docs(spark, 40)).collect()
    for r in rows:
        assert r["zeros"] > 0
        assert r["hll_est"] == HLL_LC_TABLE[r["zeros"] - 1]
        assert abs(r["hll_est"] - r["exact"]) <= 2


def test_register_geometry(sketched):
    for r in sketched.values():
        assert 1 <= r["n_regs"] <= HLL_M
        assert r["zeros"] == HLL_M - r["n_regs"]
        assert r["hll_est"] >= 1


def test_deterministic(spark, sketched):
    again = {r["host"]: r for r in hll_host_distinct(_docs(spark, 800)).collect()}
    assert again == sketched
