"""Filter-funnel invariants: monotone survivors, unique<=total kills,
last-row survivors == the curation keep count."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel(spark):
    return (
        entry.queries()["corpus_filter_funnel"](spark, SF_DIR)
        .toPandas()
        .sort_values("stage")
    )


def test_shape_and_order(funnel):
    assert list(funnel.gate) == ["quality", "perplexity", "dedup", "sample"]
    assert list(funnel.stage) == [1, 2, 3, 4]


def test_unique_bounded_by_total(funnel):
    assert (funnel.n_unique_fail <= funnel.n_fail).all()
    assert (funnel.n_fail >= 0).all()


def test_survivors_monotone_nonincreasing(funnel):
    s = list(funnel.n_survive)
    assert all(a >= b for a, b in zip(s, s[1:]))


def test_last_survivors_match_keep_count(spark, funnel):
    from pdfextract_spark.functions import curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = curation.curation_flags(docs).filter("keep").count()
    assert int(funnel.n_survive.iloc[-1]) == kept


def test_fail_pm_consistent(funnel):
    # recompute fail_pm from n_fail and the implied total (stage-1 identity:
    # n_fail + survivors-of-gate-1-alone is not total, so recover total from
    # per-mille: fail_pm = 1000*n_fail div total must hold for SOME total —
    # cross-check that all four rows agree on one total via bounds.
    import math

    los, his = [], []
    for _, r in funnel.iterrows():
        if r.fail_pm == 0:
            if r.n_fail == 0:
                continue
            los.append(1000 * r.n_fail + 1)
            his.append(math.inf)
        else:
            # fail_pm <= 1000*n_fail/total < fail_pm+1
            los.append(1000 * r.n_fail / (r.fail_pm + 1))
            his.append(1000 * r.n_fail / r.fail_pm)
    if los:
        assert max(los) <= min(his) + 1e-9
