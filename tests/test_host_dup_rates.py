"""Host dup rates: planted mirror hosts saturate dup_pm; clean hosts don't."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rates(spark):
    return entry.queries()["web_host_dup_rates"](spark, SF_DIR).toPandas()


def test_planted_mirrors_saturate(rates):
    by = rates.set_index("host")
    # m3 mirrors every h3 page verbatim: every page on both hosts is a dup
    assert int(by.loc["m3"].dup_pm) == 1000
    assert int(by.loc["h3"].dup_pm) == 1000
    # p7 carries half of h7: every p7 page is a dup, h7 is partial
    assert int(by.loc["p7"].dup_pm) == 1000
    assert 0 < int(by.loc["h7"].dup_pm) < 1000


def test_bounds_and_fp_counts(rates):
    assert (rates.dup_pm >= 0).all() and (rates.dup_pm <= 1000).all()
    assert (rates.n_dup_docs <= rates.n_docs).all()
    assert (rates.n_unique_fp <= rates.n_docs).all()
    assert (rates.n_unique_fp >= 1).all()
