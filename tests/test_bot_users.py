"""Bot detection: planted clockwork users flag, organic users never do."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def users(spark):
    return entry.queries()["window_bot_users"](spark, SF_DIR).toPandas()


def test_planted_bots_flag(users):
    bots = users[users.user_id.str.startswith("b")]
    assert len(bots) == 4
    assert bots.bot_flag.all()
    assert (bots.dispersion_pm == 0).all()  # exact 60s cadence
    assert (bots.mean_gap_s == 60).all()


def test_organic_users_never_flag(users):
    organic = users[~users.user_id.str.startswith("b")]
    assert len(organic) > 0
    assert not organic.bot_flag.any()
    # humans disperse: well above the clockwork threshold
    multi = organic[organic.n_gaps >= 5]
    assert (multi.dispersion_pm > 10).all()
