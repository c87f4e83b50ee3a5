"""Site components: planted mirrors form multi-host sites, others singleton."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sites(spark):
    return entry.queries()["web_site_components"](spark, SF_DIR).toPandas()


def test_planted_mirror_sites(sites):
    by = sites.set_index("host")
    # the full mirror m3 shares a site with h3
    assert by.loc["m3"].site == by.loc["h3"].site
    assert int(by.loc["m3"].site_size) >= 2
    # the partial mirror p7 joins h7 IFF its coin-dependent jaccard clears
    # the 0.5 gate (mirror_hosts' documented 333-666 range) — sites must
    # agree with the pair relation either way
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    pairs = entry.queries()["web_mirror_hosts"](s, SF_DIR).toPandas()
    paired = bool(
        ((pairs.host_a == "h7") & (pairs.host_b == "p7")).any()
        or ((pairs.host_a == "p7") & (pairs.host_b == "h7")).any()
    )
    same_site = by.loc["p7"].site == by.loc["h7"].site
    assert same_site == paired


def test_every_host_labeled_once(spark, sites):
    assert sites.host.is_unique
    # site sizes are consistent with the grouping
    for site, grp in sites.groupby("site"):
        assert (grp.site_size == len(grp)).all()
