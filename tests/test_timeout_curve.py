"""Timeout curve: monotonicity, endpoint identities, and agreement with an
actual sessionize run at one boundary timeout."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curve(spark):
    return (
        entry.queries()["window_timeout_curve"](spark, SF_DIR)
        .toPandas()
        .sort_values("timeout_s")
    )


def test_monotone_and_endpoints(spark, curve):
    # bigger timeout -> fewer sessions; the largest timeout yields exactly
    # one session per user (no gap exceeds it — it's the top bucket's edge)
    assert curve.n_sessions.is_monotonic_decreasing
    users = int(curve.n_users.iloc[0])
    assert int(curve.n_sessions.iloc[-1]) == users
    assert (curve.n_sessions >= users).all()


def test_matches_direct_sessionize(spark, curve):
    # pick a mid-curve boundary T and sessionize directly with it
    t = int(curve.timeout_s.iloc[len(curve) // 2])
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    gap = F.expr(
        "(unix_micros(cast(ts as timestamp))"
        " - unix_micros(cast(lag(ts) over"
        " (partition by user_id order by ts) as timestamp))) div 1000000"
    )
    starts = (
        ev.select(gap.alias("g"))
        .select(
            F.when(F.col("g").isNull() | (F.col("g") > t), 1)
            .otherwise(0)
            .alias("s")
        )
        .agg(F.sum("s"))
        .collect()[0][0]
    )
    row = curve[curve.timeout_s == t].iloc[0]
    assert int(row.n_sessions) == int(starts)
