"""Quality-threshold calibration + host quality aggregation: gate
semantics, conservative-keep property, DuckDB mirror equality."""

import duckdb

from pdfextract_spark.functions import textops, webclean

SF = "/root/testdata/sf0.001/documents.parquet"


def _mirror(sp, sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(sql).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))


def test_quality_calibrate_semantics(spark):
    docs = spark.read.parquet(SF)
    cal = textops.quality_calibrate(docs).toPandas().set_index("target_pm")
    scores = textops.readability(docs).toPandas()
    pts = scores.flesch_milli.clip(lower=0) // 1000
    n = len(pts)
    for t, row in cal.iterrows():
        kept = (pts >= row.threshold_pt).sum()
        # the relation's own numbers are the true gate counts
        assert kept == row.kept_docs
        assert row.total_docs == n
        # conservative: achieves at least the target...
        assert kept * 1000 >= t * n
        assert row.achieved_pm == 1000 * kept // n
        # ...and one point higher would under-keep (threshold is maximal)
        assert (pts >= row.threshold_pt + 1).sum() * 1000 < t * n
    # higher targets need lower thresholds
    assert cal.threshold_pt.is_monotonic_decreasing


def test_quality_calibrate_mirror(spark):
    docs = spark.read.parquet(SF)
    _mirror(
        textops.quality_calibrate(docs).toPandas(),
        textops.sql_quality_calibrate(),
    )


def test_host_quality_semantics(spark):
    docs = spark.read.parquet(SF)
    hq = webclean.host_quality_rank(docs).toPandas()
    assert (hq.n_docs > 0).all()
    assert (hq.mean_flesch_milli >= 0).all()
    assert (
        hq.priority_milli == hq.mean_flesch_milli * hq.log2_docs
    ).all()
    # hosts exist and the fixture's synthesized pages cover many
    assert len(hq) > 50
    # priority favors multi-doc hosts over one-hit hosts at equal quality
    assert (hq.log2_docs >= 1).all()


def test_host_quality_mirror(spark):
    docs = spark.read.parquet(SF)
    _mirror(
        webclean.host_quality_rank(docs).toPandas(),
        webclean.sql_host_quality_rank(),
    )
