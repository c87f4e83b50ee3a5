"""windowFunnel semantics: planted chains, window anchoring at the first
step, latest-start re-anchoring, arrival-order independence, DuckDB mirror."""

import duckdb
from datetime import datetime, timedelta

from pdfextract_spark.queries import q_window_funnel, SQL_WINDOW_FUNNEL

T0 = datetime(2024, 1, 1)


def _mk(spark, rows, tmp_path):
    # rows: (user_id, minutes, event_type)
    data = [
        (i, T0 + timedelta(minutes=m), u, ty, 0.0, "{}")
        for i, (u, m, ty) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_semantics(spark, tmp_path):
    rows = [
        # user 1: full funnel inside the hour -> depth 3
        (1, 0, "view"), (1, 30, "click"), (1, 59, "purchase"),
        # user 2: click falls outside the 1h window of the view -> depth 1
        (2, 0, "view"), (2, 120, "click"),
        # user 3: wrong order (click before any view) -> depth 1 (the view)
        (3, 0, "click"), (3, 10, "purchase"), (3, 20, "view"),
        # user 4: latest-start re-anchor — first view too old, the second
        # view anchors the window and the click lands inside -> depth 2
        (4, 0, "view"), (4, 50, "view"), (4, 70, "click"),
        # user 5: whole-chain window: click at 40 in-window, purchase at 70
        # is 70min after the ANCHORING view -> depth stays 2
        (5, 0, "view"), (5, 40, "click"), (5, 70, "purchase"),
        # user 6: nothing relevant -> depth 0
        (6, 0, "error"),
    ]
    sf = _mk(spark, rows, tmp_path)
    got = {
        r.depth: r.n_users
        for r in q_window_funnel(spark, sf).collect()
    }
    assert got == {3: 1, 1: 2, 2: 2, 0: 1}

    # arrival order must not matter (the fold sorts)
    sf2 = _mk(spark, list(reversed(rows)), tmp_path)
    got2 = {
        r.depth: r.n_users
        for r in q_window_funnel(spark, sf2).collect()
    }
    assert got2 == got


def test_funnel_mirror(spark):
    sp = (
        q_window_funnel(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    du = con.sql(SQL_WINDOW_FUNNEL).df().sort_values("depth").reset_index(drop=True)
    assert sp.astype(str).equals(du[sp.columns].astype(str))
