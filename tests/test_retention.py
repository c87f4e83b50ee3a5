"""Cohort retention grid: day-0 totality, bounds, cohort conservation."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def grid(spark):
    return entry.queries()["window_retention"](spark, SF_DIR).toPandas()


def test_day_zero_is_total(grid):
    d0 = grid[grid.day_offset == 0]
    assert len(d0) > 0
    # every user is active on their own first day
    assert (d0.n_active == d0.n_cohort).all()
    assert (d0.retention_milli == 1000).all()


def test_bounds(grid):
    assert (grid.day_offset >= 0).all()
    assert (grid.n_active <= grid.n_cohort).all()
    assert (grid.retention_milli <= 1000).all()
    assert (grid.n_active >= 1).all()


def test_cohorts_partition_users(spark, grid):
    users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    d0 = grid[grid.day_offset == 0]
    assert d0.n_cohort.sum() == users
