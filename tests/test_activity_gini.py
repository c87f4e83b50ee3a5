"""Activity Gini: python recompute over the raw census, bounds, top-share."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def row(spark):
    df = entry.queries()["window_activity_gini"](spark, SF_DIR).toPandas()
    assert len(df) == 1
    return df.iloc[0]


@pytest.fixture(scope="module")
def counts(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    return sorted(ev.groupby("user_id").size().tolist())


def test_exact_recompute(row, counts):
    n = len(counts)
    s = sum(counts)
    t = sum((i + 1) * x for i, x in enumerate(counts))
    assert int(row.n_users) == n
    assert int(row.n_events) == s
    assert int(row.max_events) == max(counts)
    assert int(row.gini_milli) == (1000 * (2 * t - (n + 1) * s)) // (n * s)
    k = max(1, n // 100)
    top = sum(sorted(counts, reverse=True)[:k])
    assert int(row.top1pct_share_pm) == (1000 * top) // s


def test_bounds(row):
    assert 0 <= int(row.gini_milli) < 1000
    assert 0 < int(row.top1pct_share_pm) <= 1000
