"""Intra-document line dedup: planted repeat recovery, order preservation,
zero-shuffle plan, DuckDB mirror equality."""

import duckdb
from pyspark.sql import functions as F

from pdfextract_spark.functions import webclean

SF = "/root/testdata/sf0.001/documents.parquet"


def test_intradoc_dedup_drops_planted_repeats(spark):
    docs = spark.read.parquet(SF)
    out = webclean.intradoc_line_dedup(docs).toPandas()
    planted = webclean.synthesize_intradoc(docs).toPandas().set_index("doc_id")
    assert len(out) == 500

    for _, r in out.iterrows():
        lines = planted.loc[r.doc_id].web_text.split("\n")
        firsts = []
        for x in lines:
            if x not in firsts:
                firsts.append(x)
        # first-occurrence keep, order preserved
        assert r.clean_text.split("\n") == firsts, r.doc_id
        assert r.n_lines == len(lines)
        assert r.n_dropped == len(lines) - len(firsts)

    # the synthesizer actually planted repeats, and they were all dropped
    assert (out.n_dropped > 0).sum() > 100
    sp = spark.createDataFrame(out)
    clean_lines = F.split("clean_text", "\n")
    redup = sp.select(
        (F.size(clean_lines) - F.size(F.array_distinct(clean_lines))).alias("d")
    )
    assert redup.agg(F.sum("d")).collect()[0][0] == 0


def test_intradoc_dedup_zero_shuffle(spark):
    docs = spark.read.parquet(SF)
    plan = (
        webclean.intradoc_line_dedup(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:800]


def test_intradoc_dedup_mirror(spark):
    docs = spark.read.parquet(SF)
    sp = webclean.intradoc_line_dedup(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(webclean.sql_intradoc_line_dedup()).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))
