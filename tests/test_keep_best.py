"""Quality-aware dedup keeper: planted shout-copy recovery, naive contrast,
DuckDB mirror equality."""

import duckdb

from pdfextract_spark.functions import dedup


def test_keep_best_recovers_clean_copy(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = dedup.synthesize_quality_dup_corpus(docs)
    out = dedup.keep_best_dedup(corpus).toPandas()
    planted = out[out.n_copies > 1]
    assert len(planted) > 0
    # quality keeper is the clean moved copy, never the shouted original
    assert (planted.keeper_doc_id >= dedup.KB_COPY_OFFSET).all()
    assert (planted.keeper_shout_milli == 0).all()
    # the naive min-doc_id keeper would keep the shouted copy every time
    assert (planted.naive_doc_id < dedup.KB_COPY_OFFSET).all()
    assert planted.upgraded.all()
    # untouched docs: singleton clusters, keeper == naive
    solo = out[out.n_copies == 1]
    assert (~solo.upgraded).all()
    # conservation: one keeper per cluster, clusters partition the corpus
    assert out.n_copies.sum() == corpus.count()


def test_keep_best_mirror(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sp = (
        dedup.keep_best_dedup(dedup.synthesize_quality_dup_corpus(docs))
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    du = con.sql(dedup.sql_keep_best_dedup()).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))
