"""Dup x quality interaction: planted structure — every planted cluster is
size 2 with one shouted copy, singletons are clean lowercase."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bands(spark):
    return entry.queries()["dedup_dup_quality"](spark, SF_DIR).toPandas()


def test_planted_band_structure(bands):
    by = bands.set_index("band")
    assert "1" in by.index and "2-3" in by.index
    # planted clusters are exactly pairs: every 2-3 band doc sits in a
    # 2-cluster, so n_docs = 2 * n_clusters
    assert int(by.loc["2-3"].n_docs) == 2 * int(by.loc["2-3"].n_clusters)
    assert int(by.loc["1"].n_docs) == int(by.loc["1"].n_clusters)


def test_duplicated_mass_scores_worse(bands):
    by = bands.set_index("band")
    # singletons are untouched lowercase fixture text (shout ~ 0); planted
    # clusters average one shouted copy each (mean ~ 500)
    assert int(by.loc["1"].mean_shout_milli) < 50
    assert int(by.loc["2-3"].mean_shout_milli) > 300
