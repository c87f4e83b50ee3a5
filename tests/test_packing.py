"""Sequence packing: greedy fixed-budget fill semantics pinned on crafted
lengths; determinism across retries; stream-parallel equivalence. Corpus
parity vs the recursive-CTE oracle runs in test_oracle_queries
(corpus_pack_sequences / corpus_pack_stats)."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import packing


def docs_of_lengths(spark, lengths, n_streams=1):
    # doc_id ascending == pack order; text of exactly `n` words
    rows = [(i, " ".join(["w"] * n), "en", "s", n) for i, n in enumerate(lengths)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def pack_all(spark, lengths, budget):
    # n_streams=1 so every doc lands in one fold, in doc_id order
    out = packing.pack_sequences(
        docs_of_lengths(spark, lengths), budget=budget, n_streams=1
    ).collect()
    return [(int(r.doc_id), r.seq_id, r.seq_offset) for r in sorted(out, key=lambda r: int(r.doc_id))]


def test_greedy_fill_and_overflow_reset(spark):
    # budget 10: [4,4,4] -> third doc overflows (8+4>10) -> new seq
    assert pack_all(spark, [4, 4, 4], 10) == [(0, 0, 0), (1, 0, 4), (2, 1, 0)]
    # exact fit closes nothing early: [4,6,1] -> 4+6=10 fits, 1 starts seq 1
    assert pack_all(spark, [4, 6, 1], 10) == [(0, 0, 0), (1, 0, 4), (2, 1, 0)]


def test_oversized_doc_occupies_a_sequence_alone(spark):
    # 12 > budget 10: doc 1 gets its own sequence; doc 2 starts the next
    assert pack_all(spark, [3, 12, 3], 10) == [(0, 0, 0), (1, 1, 0), (2, 2, 0)]
    # oversized FIRST doc stays in seq 0 (no phantom leading empty seq)
    assert pack_all(spark, [12, 3], 10) == [(0, 0, 0), (1, 1, 0)]


def test_deterministic_across_runs_and_stream_assignment(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = packing.pack_sequences(docs).collect()
    b = packing.pack_sequences(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every sequence respects the budget unless it is a single oversized doc
    per_seq = (
        packing.pack_sequences(docs)
        .groupBy("stream", "seq_id")
        .agg(F.sum("n_tokens").alias("toks"), F.count("*").alias("docs"))
        .collect()
    )
    for r in per_seq:
        assert r.toks <= packing.BUDGET or r.docs == 1


def test_length_buckets_invariants(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = packing.length_bucket_batches(docs).toPandas()
    assert len(out) == docs.count()
    # bucket = floor(log2(n_tokens)): every doc sits inside its band, so
    # within-batch spread is < 2x and per-doc padding is < its own length
    assert ((out.n_tokens >= 2**out.bucket) & (out.n_tokens < 2**(out.bucket + 1))).all()
    assert (out.batch_max >= out.n_tokens).all()
    assert (out.pad_tokens < out.n_tokens).all()
    # batches are fixed-size with one ragged tail per (bucket, stream)
    sizes = out.groupby(["bucket", "stream", "batch_id"]).size()
    for (b, s), grp in sizes.groupby(level=[0, 1]):
        assert (grp.iloc[:-1] == packing.BATCH_SIZE).all()
        assert 1 <= grp.iloc[-1] <= packing.BATCH_SIZE
    # batch_max really is the batch max
    bm = out.groupby(["bucket", "stream", "batch_id"]).n_tokens.max()
    joined = out.set_index(["bucket", "stream", "batch_id"])
    assert (joined.batch_max == bm.loc[joined.index]).all()


def test_length_buckets_matches_mirror(spark):
    import duckdb
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sp = packing.length_bucket_batches(docs).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    du = con.sql(packing.sql_length_bucket_batches()).df()
    key = ["doc_id"]
    sp = sp.sort_values(key).reset_index(drop=True)[sorted(sp.columns)]
    du = du.sort_values(key).reset_index(drop=True)[sorted(du.columns)]
    assert sp.astype(str).equals(du.astype(str))


def test_padding_report_bucketing_wins(spark):
    import duckdb
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = packing.padding_report(docs).toPandas()
    assert set(rep.stream) == set(range(packing.N_STREAMS))
    # identical doc population under both layouts
    assert rep.n_docs.sum() == docs.count()
    # the point of the layout: bucketing saves padding on a length-varied
    # corpus (deterministic, so this is a stable fixture property), and the
    # per-mille rates are consistent with the totals
    assert rep.pad_bucketed.sum() < rep.pad_naive.sum()
    assert (rep.pad_bucketed_milli == 1000 * rep.pad_bucketed // rep.real_tokens).all()
    assert (rep.pad_naive_milli == 1000 * rep.pad_naive // rep.real_tokens).all()
    # mirror equality
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    du = con.sql(packing.sql_padding_report()).df()
    sp = rep.sort_values("stream").reset_index(drop=True)[sorted(rep.columns)]
    du = du.sort_values("stream").reset_index(drop=True)[sorted(du.columns)]
    assert sp.astype(str).equals(du.astype(str))


def test_pack_bpe_budget_and_mirror(spark):
    import duckdb
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sp = packing.pack_sequences_bpe(docs).toPandas()
    assert len(sp) == 500
    # no sequence exceeds the BPE budget unless a single doc alone does
    fills = sp.groupby(["stream", "seq_id"]).n_tokens.agg(["sum", "count"])
    over = fills[fills["sum"] > packing.BPE_BUDGET]
    assert (over["count"] == 1).all()
    # packing actually happened (multi-doc sequences exist)
    assert (fills["count"] > 1).any()
    # offsets are the running fill
    for (_, _), grp in sp.groupby(["stream", "seq_id"]):
        grp = grp.sort_values("seq_offset")
        assert (
            grp.seq_offset.values[1:]
            == (grp.seq_offset + grp.n_tokens).values[:-1]
        ).all()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    du = con.sql(packing.sql_pack_sequences_bpe()).df()
    key = sorted(sp.columns)
    s2 = sp[key].sort_values(key).reset_index(drop=True)
    d2 = du[key].sort_values(key).reset_index(drop=True)
    assert s2.astype(str).equals(d2.astype(str))
