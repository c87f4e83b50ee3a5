"""DAU/WAU stickiness: bounds, window containment, DAU cross-check."""

import pytest

import __spark_entry__ as entry
from pdfextract_spark.queries import STICKY_W

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def grid(spark):
    return entry.queries()["window_stickiness"](spark, SF_DIR).toPandas()


def test_bounds(grid):
    # DAU contributes to its own trailing window, so WAU >= DAU > 0 and the
    # ratio lives in (0, 1000].
    assert len(grid) > 0
    assert (grid.n_dau >= 1).all()
    assert (grid.n_wau >= grid.n_dau).all()
    assert (grid.stickiness_milli >= 1).all()
    assert (grid.stickiness_milli <= 1000).all()


def test_wau_bounded_by_window_sum(grid):
    # WAU on day d counts distinct users over <= STICKY_W days, so it is
    # bounded by the sum of the window's DAUs (equality iff disjoint users).
    dau = dict(zip(grid.day, grid.n_dau))
    for _, row in grid.iterrows():
        cap = sum(dau.get(row.day - k, 0) for k in range(STICKY_W))
        assert row.n_wau <= cap


def test_dau_matches_direct_census(spark, grid):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import functions as F

    direct = (
        ev.select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day"),
        )
        .distinct()
        .groupBy("day")
        .count()
        .toPandas()
    )
    direct_map = dict(zip(direct.day, direct["count"]))
    got = dict(zip(grid.day, grid.n_dau))
    # every day with activity appears, with the exact distinct-user count
    assert got == {int(k): int(v) for k, v in direct_map.items()}
