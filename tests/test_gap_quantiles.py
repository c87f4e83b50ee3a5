"""Gap quantiles: bucket geometry, cumulative monotonicity, recompute."""

import math

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hist(spark):
    return (
        entry.queries()["window_gap_quantiles"](spark, SF_DIR)
        .toPandas()
        .sort_values("bucket")
    )


def test_bucket_geometry(hist):
    for _, r in hist.iterrows():
        assert r.lo_s == 2**r.bucket - 1
        assert r.hi_s == 2 ** (r.bucket + 1) - 2
    assert hist.cum_pm.is_monotonic_increasing
    assert 997 <= int(hist.cum_pm.iloc[-1]) <= 1000


def test_python_recompute(spark, hist):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev = ev.sort_values(["user_id", "ts"])
    gaps = []
    for _, grp in ev.groupby("user_id"):
        ts = grp.ts.astype("int64") // 1000  # ns -> us
        for a, b in zip(ts, ts[1:]):
            gaps.append((b - a) // 1_000_000)
    import collections

    counts = collections.Counter(int(g + 1).bit_length() - 1 for g in gaps)
    got = dict(zip(hist.bucket, hist.n_gaps))
    assert got == dict(counts)
