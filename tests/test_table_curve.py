"""ANN table curve: cumulative identity and total agreement with the
production pair miner."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curve(spark):
    return (
        entry.queries()["sim_table_curve"](spark, SF_DIR)
        .toPandas()
        .sort_values("n_tables")
    )


def test_cumulative_identity(curve):
    run = 0
    for _, r in curve.iterrows():
        run += int(r.n_new_pairs)
        assert int(r.cum_pairs) == run
    assert (curve.n_tables >= 1).all() and (curve.n_tables <= 6).all()


def test_total_matches_pair_miner(spark, curve):
    pairs = entry.queries()["sim_ann_lsh"](spark, SF_DIR).count()
    assert int(curve.cum_pairs.iloc[-1]) == pairs
