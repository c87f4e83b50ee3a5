"""Quality-annealed curriculum schedule: monotone admission, per-shard
dense order, DuckDB mirror equality."""

import duckdb

from pdfextract_spark.functions import curation, textops

SF = "/root/testdata/sf0.001/documents.parquet"


def test_curriculum_admission_and_order(spark):
    docs = spark.read.parquet(SF)
    sched = curation.curriculum_schedule(docs).toPandas()
    buckets = textops.ppl_buckets(docs).toPandas().set_index("doc_id")
    enter = {"head": 0, "middle": 1, "tail": 2}

    # every doc appears in exactly the epochs from its entry to the last
    for doc, grp in sched.groupby("doc_id"):
        e0 = enter[buckets.loc[doc].ppl_bucket]
        assert sorted(grp.epoch) == list(range(e0, curation.CURR_EPOCHS)), doc
    # the last epoch trains on the whole corpus
    n = len(buckets)
    assert (sched.epoch == curation.CURR_EPOCHS - 1).sum() == n
    # epoch sizes are monotone non-decreasing (annealing admits, never
    # evicts)
    sizes = sched.groupby("epoch").size()
    assert (sizes.diff().dropna() >= 0).all()

    # pos is a dense 1..k order inside every (epoch, shard)
    for (_, _), grp in sched.groupby(["epoch", "shard"]):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))
    # the order is epoch-salted: consecutive epochs disagree somewhere
    e1 = sched[sched.epoch == 1].set_index("doc_id")[["shard", "pos"]]
    e2 = sched[sched.epoch == 2].set_index("doc_id")[["shard", "pos"]]
    common = e1.index.intersection(e2.index)
    assert not e1.loc[common].equals(e2.loc[common])


def test_curriculum_mirror(spark):
    docs = spark.read.parquet(SF)
    sp = curation.curriculum_schedule(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}'")
    du = con.sql(curation.sql_curriculum_schedule()).df()
    key = sorted(sp.columns)
    sp = sp[key].sort_values(key).reset_index(drop=True)
    du = du[key].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))
