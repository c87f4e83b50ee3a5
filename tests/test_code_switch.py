"""Code-switch detection: planted mixed-language separation, monolingual
zero contract, boundary-count arithmetic, DuckDB mirror equality."""

import duckdb
import pytest

from pdfextract_spark.functions import textops

SF = "/root/testdata/sf0.001/documents.parquet"

EN = "the cat and the dog went to the house in the morning and it is that "
DE = "der hund und die katze das ist ein gutes haus nicht mit dem mann und "


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = textops.code_switch(docs).toPandas()
    return {r.doc_id: r for r in out.itertuples()}


def test_planted_separation(spark):
    v = _run(
        spark,
        [
            ("mono", EN * 4),                      # one language throughout
            ("mixed", EN * 2 + DE * 2),            # one hard switch
            ("alternating", (EN + DE) * 2),        # switch every window-ish
        ],
    )
    assert v["mono"].major_lang == "en"
    assert v["mono"].n_off_major == 0
    assert v["mono"].boundary_switches == 0
    assert v["mono"].switch_milli == 0
    assert v["mixed"].n_off_major > 0
    assert v["mixed"].boundary_switches >= 1
    assert v["alternating"].boundary_switches > v["mixed"].boundary_switches


def test_window_arithmetic(spark):
    words = 50  # -> ceil(50/16) = 4 windows
    text = " ".join(["the"] * words)
    v = _run(spark, [("d", text)])
    assert v["d"].n_windows == (words + textops.CS_WIN - 1) // textops.CS_WIN
    assert v["d"].major_lang == "en"


def test_fixture_sanity(spark):
    docs = spark.read.parquet(SF)
    out = textops.code_switch(docs).toPandas()
    assert len(out) == docs.count()
    assert (out.switch_milli <= 1000).all()
    assert (out.n_off_major <= out.n_windows).all()
    assert (out.boundary_switches <= out.n_windows).all()


def test_mirror(spark):
    docs = spark.read.parquet(SF)
    sp = textops.code_switch(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(textops.sql_code_switch()).df()
    sp = sp.sort_values("doc_id").reset_index(drop=True)
    du = du.sort_values("doc_id").reset_index(drop=True)
    assert len(sp) == len(du)
    for c in sp.columns:
        assert (sp[c].astype(str) == du[c].astype(str)).all(), c
