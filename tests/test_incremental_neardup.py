"""Incremental NEAR-dup dedup: planted edited-copy recovery, the
exact-pass-provably-misses contrast, DuckDB mirror equality."""

import duckdb
from pyspark.sql import functions as F

from pdfextract_spark.functions import dedup

SF = "/root/testdata/sf0.001/documents.parquet"


def test_incremental_neardup_catches_edited_copies(spark):
    docs = spark.read.parquet(SF)
    out = dedup.incremental_neardup(docs).toPandas()
    out["doc_num"] = out.doc_id.astype("int64")
    history, batch = dedup.synthesize_incremental_near(docs)
    # one verdict per batch doc
    assert len(out) == batch.count()

    hist_plants = out[
        (out.doc_num >= dedup.INC_HIST_OFFSET)
        & (out.doc_num < dedup.INC_BATCH_OFFSET)
    ]
    assert len(hist_plants) > 0
    # every planted edited copy of a history doc is caught as historical
    assert (hist_plants.status == "near_dup_historical").all()
    # and the best match is the plant's own original almost everywhere —
    # the deterministic fixture has exactly one natural tie (docs 56/157
    # agree at the same 0.9375 and the tie-break takes the smaller id)
    hit = (
        hist_plants.match_doc.astype("int64")
        == hist_plants.doc_num - dedup.INC_HIST_OFFSET
    )
    assert hit.mean() >= 0.95 and hit.sum() >= len(hist_plants) - 2
    assert (hist_plants.jaccard_est >= dedup.INC_NEAR_JACC).all()

    batch_plants = out[out.doc_num >= dedup.INC_BATCH_OFFSET]
    assert len(batch_plants) > 0
    # an edited in-batch copy is never silently kept
    assert (batch_plants.status != "kept").all()
    assert (batch_plants.status == "near_dup_in_batch").any()


def test_exact_incremental_misses_the_edits(spark):
    # the contrast that justifies the operator: the SAME planted corpus
    # through the exact md5 pass marks every plant as kept (the edit
    # changes the fingerprint), while the near pass flags them all
    docs = spark.read.parquet(SF)
    history, batch = dedup.synthesize_incremental_near(docs)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    exact = dedup.incremental_dedup_tables(
        history.select(fp.alias("fingerprint")),
        batch.select("doc_id", fp.alias("fingerprint")),
    ).toPandas()
    plants = exact[exact.doc_id.astype("int64") >= dedup.INC_HIST_OFFSET]
    assert len(plants) > 0
    assert (plants.status == "kept").all()


def test_incremental_neardup_mirror(spark):
    docs = spark.read.parquet(SF)
    sp = dedup.incremental_neardup(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(dedup.sql_incremental_neardup()).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))
