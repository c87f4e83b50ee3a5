"""Session transition census semantics on planted event sequences: pair
adjacency, the session-gap cut, per-source shares summing to ~1000, and
arrival-order independence. Value parity runs in the oracle suite
(window_transitions)."""

import datetime as dt

import pytest

from pdfextract_spark.queries import q_window_transitions


def _events(spark, rows):
    # rows: (event_id, user_id, type, seconds-offset)
    base = dt.datetime(2026, 1, 1)
    data = [
        (eid, base + dt.timedelta(seconds=s), uid, ty, 1.0)
        for (eid, uid, ty, s) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


@pytest.fixture()
def patched_loader(monkeypatch):
    import pdfextract_spark.queries as q

    def use(df):
        monkeypatch.setattr(q, "_t", lambda spark, sf, name: df)

    return use


def test_adjacency_and_gap(spark, patched_loader):
    df = _events(
        spark,
        [
            (1, 1, "view", 0),
            (2, 1, "click", 10),
            (3, 1, "purchase", 20),
            # session break: 1h gap -> view->view NOT counted across it
            (4, 1, "view", 3700),
            (5, 1, "click", 3710),
            # another user interleaved, never pairs with user 1
            (6, 2, "view", 5),
            (7, 2, "view", 15),
        ],
    )
    patched_loader(df)
    out = {(r["src"], r["dst"]): r for r in q_window_transitions(spark, "x").collect()}
    assert out[("view", "click")]["n"] == 2
    assert out[("click", "purchase")]["n"] == 1
    assert out[("view", "view")]["n"] == 1  # user 2 only
    assert ("purchase", "view") not in out  # killed by the session gap


def test_shares_per_source(spark, patched_loader):
    df = _events(
        spark,
        [
            (1, 1, "view", 0),
            (2, 1, "click", 1),
            (3, 1, "view", 2),
            (4, 1, "click", 3),
            (5, 1, "view", 4),
            (6, 1, "purchase", 5),
        ],
    )
    patched_loader(df)
    rows = q_window_transitions(spark, "x").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r["share_pm"])
    for src, shares in by_src.items():
        assert 1000 - len(shares) < sum(shares) <= 1000, (src, shares)


def test_arrival_order_independent(spark, patched_loader):
    rows = [
        (1, 1, "view", 0),
        (2, 1, "click", 10),
        (3, 1, "purchase", 20),
        (4, 2, "view", 0),
        (5, 2, "click", 30),
    ]
    df1 = _events(spark, rows)
    df2 = _events(spark, list(reversed(rows)))
    patched_loader(df1)
    a = sorted(tuple(r) for r in q_window_transitions(spark, "x").collect())
    patched_loader(df2)
    b = sorted(tuple(r) for r in q_window_transitions(spark, "x").collect())
    assert a == b
