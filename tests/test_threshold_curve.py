"""Threshold curve: cumulative consistency and agreement with the gated
pairs relation at the JACCARD_MIN decile."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curve(spark):
    return (
        entry.queries()["dedup_threshold_curve"](spark, SF_DIR)
        .toPandas()
        .sort_values("band_milli")
    )


def test_cumulative_identity(curve):
    # cum at band b = sum of n_pairs over bands >= b; lowest band's cum is
    # the total candidate count
    total = int(curve.n_pairs.sum())
    for _, r in curve.iterrows():
        expect = int(curve[curve.band_milli >= r.band_milli].n_pairs.sum())
        assert int(r.cum_pairs_ge) == expect
    assert int(curve.cum_pairs_ge.iloc[0]) == total


def test_bands_are_deciles(curve):
    assert (curve.band_milli % 100 == 0).all()
    assert (curve.band_milli <= 1000).all()
    assert (curve.band_milli >= 0).all()


def test_matches_gated_pairs_relation(spark, curve):
    # pairs admitted by the production gate (jaccard >= 0.1) equal the
    # curve's cum at band 100 exactly: integer decile banding puts a pair
    # at band >= 100 iff 10*shared div union >= 1 iff jaccard >= 0.1
    pairs = entry.queries()["dedup_ngram_jaccard"](spark, SF_DIR)
    n_gated = pairs.count()
    at_100 = curve[curve.band_milli == 100]
    cum = (
        int(at_100.cum_pairs_ge.iloc[0])
        if len(at_100)
        else int(curve[curve.band_milli > 100].n_pairs.sum())
    )
    assert n_gated == cum
