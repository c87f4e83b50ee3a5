"""Event mix: per-day share totality and census conservation."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_mix_invariants(spark):
    out = entry.queries()["window_event_mix"](spark, SF_DIR).toPandas()
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert int(out.n.sum()) == total
    for day, grp in out.groupby("day"):
        s = int(grp.share_pm.sum())
        # floor division loses < |types| per-mille per day
        assert 1000 - len(grp) < s <= 1000
        assert (grp.share_pm >= 1).all() or (grp.n >= 1).all()
