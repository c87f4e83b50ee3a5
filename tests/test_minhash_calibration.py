"""MinHash calibration: band identities + the estimator is unbiased in
direction (higher m bands carry higher true Jaccard)."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cal(spark):
    return (
        entry.queries()["dedup_minhash_calibration"](spark, SF_DIR)
        .toPandas()
        .sort_values("m_match")
    )


def test_band_identities(cal):
    assert (cal.m_match >= 1).all() and (cal.m_match <= 16).all()
    assert (cal.est_milli == (1000 * cal.m_match) // 16).all()
    assert (cal.mean_true_milli <= 1000).all()
    assert (cal.n_pairs >= 1).all()


def test_high_bands_separate_from_low(cal):
    # per-band means wobble at n_pairs ~ 1 (and a low-m band collision IS
    # a false positive this relation exists to surface), so the gate is
    # separation, not strict monotonicity: the high-m mass (planted
    # near-dups) must sit far above any low-m band
    hi = cal[cal.m_match >= 14]
    lo = cal[cal.m_match <= 8]
    assert len(hi) > 0
    assert (hi.mean_true_milli >= 900).all()
    if len(lo):
        assert lo.mean_true_milli.max() < hi.mean_true_milli.min()


def test_pair_total_matches_miner(spark, cal):
    pairs = entry.queries()["dedup_minhash_lsh"](spark, SF_DIR).count()
    assert int(cal.n_pairs.sum()) == pairs
