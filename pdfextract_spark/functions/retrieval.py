"""Sparse retrieval over the corpus: BM25 top-k document ranking.

Training-data pipelines use BM25 retrieval for targeted corpus mining
(pulling domain documents for a seed query set), retrieval-augmented
eval-set construction, and contamination sweeps that go beyond exact
n-gram overlap. Terms are token BIGRAMS (the unigram head of a crawl
corpus is stopword-grade, idf ~ 0), and the query set is derived
DETERMINISTICALLY from the corpus itself — the head of the mid-frequency
bigram vocabulary, chunked into fixed-size term groups — so the DuckDB
oracle re-derives the identical queries with no side-channel input.

All arithmetic is integer fixed-point (milli-units for the tf saturation
curve, the shared 1/16-bit log2 for idf) so Spark and DuckDB produce
bit-identical scores; every integer division has positive operands, where
Spark's truncating `div` and DuckDB's flooring `//` agree.

100 TB shape: tf is the corpus-REDUCED (doc, token) relation and feeds the
df census, the doc-length relation, and scoring (one localCheckpoint, the
bounded side of the checkpoint rule); the query-term relation is ~NQ*TPQ
rows and broadcast; doc lengths join back on doc_id (one keyed shuffle);
the final ranking is a SALTED TWO-STAGE top-k — stage 1 ranks inside
(query_id, salt) so no single reducer ever sees a whole query's candidate
set (the salt is the parallelism dial; a hot query's candidates split S
ways), stage 2 ranks the <= S*topk survivors per query, a bounded frame.
Bucket-local top-k then global top-k is exact: any global top-k member is
top-k within its own bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textops import LM_PRESCALE, _s16_of

BM25_K1_MILLI = 1200   # k1 = 1.2
BM25_B_MILLI = 750     # b = 0.75
BM25_TOPK = 10         # documents returned per query
BM25_NQ = 5            # number of synthetic queries
BM25_TPQ = 3           # terms per query
BM25_SALT = 8          # stage-1 top-k fan-out (parallelism dial)
# query terms come from the mid-frequency head: df * BM25_MAXDF_MULT <= N
# keeps idf comfortably positive (rarer than 1-in-4 docs)
BM25_MAXDF_MULT = 4


def _bigram_tf(documents: DataFrame) -> DataFrame:
    """Corpus-REDUCED (doc_id, token, tf) over token BIGRAMS (docs with
    >= 2 tokens): the unigram vocabulary of a crawl head is dominated by
    stopword-frequency tokens (df ~ 0.8N here) whose BM25 idf floors at 0;
    bigrams carry a real mid-frequency band. The explode child is a
    transform over the in-row words array — O(n) element_at per row,
    evaluated once inside the generator."""
    docs = documents.filter(F.size(F.split(F.lower("text"), " ")) >= 2).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split(F.lower("text"), " ").alias("_ws"),
    )
    n_w = F.size(F.col("_ws"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_w - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("_ws"), i),
                    F.element_at(F.col("_ws"), i + 1),
                ),
            )
        ).alias("token"),
    )
    return tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))


def _tf_stats(tf: DataFrame):
    """(dl, dfc, stats) censuses of a (doc_id, token, tf) relation."""
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_toks"),
    )
    return dl, dfc, stats


def bm25_topk(
    documents: DataFrame, topk: int = BM25_TOPK, salt: int = BM25_SALT
) -> DataFrame:
    """(query_id, rank, doc_id, score_milli, n_terms) — the BM25 top-`topk`
    documents for each corpus-derived query.

    score(q, d) = sum over matched terms of idf16(t) * tfpart_milli(t, d):
      idf16   = max(0, s16(max(1, ((2N - 2df + 1) * PRESCALE) div (2df + 1))))
                (the log2 twin of the BM25+ idf, floored at 0 like Lucene)
      tfpart  = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                in milli-units with integer division throughout.
    """
    # tf feeds the df census, doc lengths, AND scoring — corpus-REDUCED
    # (distinct (doc, token) rows), the cheap side of the checkpoint rule
    tf = _bigram_tf(documents).localCheckpoint(eager=False)
    dl, dfc, stats = _tf_stats(tf)

    # deterministic query terms: top NQ*TPQ mid-frequency tokens by
    # (doc_freq desc, token asc). orderBy+limit is a distributed
    # TakeOrdered; the row_number window then runs over the bounded
    # NQ*TPQ-row frame only (same bounded-domain allowance as quantiles).
    n_terms_total = BM25_NQ * BM25_TPQ
    cand = dfc.join(F.broadcast(stats)).filter(
        F.col("doc_freq") * BM25_MAXDF_MULT <= F.col("n_docs")
    )
    head = cand.orderBy(F.desc("doc_freq"), F.asc("token")).limit(n_terms_total)
    # single-partition window GUARDRAIL: runs over the limit(NQ*TPQ) result
    # above — a constant-size frame, never corpus-scaled (allowlisted in
    # tests/test_scale_lint.py)
    wq = Window.orderBy(F.desc("doc_freq"), F.asc("token"))
    terms = head.withColumn("_rk", F.row_number().over(wq)).select(
        F.expr(f"(_rk - 1) div {BM25_TPQ}").cast("long").alias("query_id"),
        "token",
        "doc_freq",
    )
    return _score_topk(tf, dl, stats, terms, topk, salt)


def _score_topk(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    terms: DataFrame,
    topk: int,
    salt: int,
) -> DataFrame:
    """Shared scoring + salted two-stage exact top-k over a query-term
    relation (query_id, token, doc_freq) — doc_freq is the CORPUS df used
    by the idf (a bench-sourced term that never occurs in the corpus joins
    no tf rows and scores nothing, as retrieval semantics demand)."""
    k1, b = BM25_K1_MILLI, BM25_B_MILLI
    avgdl_m = F.expr("(total_toks * 1000) div n_docs")
    norm_m = F.lit(1000 - b) + F.expr(f"({b} * dl * 1000) div _avgdl_m")
    scored = (
        tf.join(F.broadcast(terms), "token")
        .join(dl, "doc_id")  # keyed shuffle: doc lengths onto candidates
        .join(F.broadcast(stats))
        .withColumn("_avgdl_m", avgdl_m)
        .withColumn("_norm_m", norm_m)
        .withColumn(
            "_denom_m", F.expr(f"tf * 1000 + ({k1} * _norm_m) div 1000")
        )
        .withColumn(
            "_tfpart_m", F.expr(f"(tf * {k1 + 1000} * 1000) div _denom_m")
        )
        .withColumn(
            "_idf_q",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"((2 * n_docs - 2 * doc_freq + 1) * {LM_PRESCALE})"
                    " div (2 * doc_freq + 1)"
                ),
            ),
        )
        .withColumn(
            "_idf16", F.greatest(F.lit(0).cast("long"), _s16_of("_idf_q"))
        )
    )
    qd = scored.groupBy("query_id", "doc_id").agg(
        F.sum(F.col("_idf16") * F.col("_tfpart_m")).cast("long").alias("score_milli"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )

    # salted two-stage top-k (exact; see module docstring)
    order = [F.desc("score_milli"), F.asc("doc_id")]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    s1 = (
        qd.withColumn("_salt", F.pmod(F.crc32(F.col("doc_id")), F.lit(salt)))
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= topk)
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        s1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "score_milli", "n_terms")
    )


def bm25_bench_topk(
    documents: DataFrame, topk: int = BM25_TOPK, salt: int = BM25_SALT
) -> DataFrame:
    """(query_id, rank, doc_id, score_milli, n_terms) — BM25 over the TRAIN
    side of the eval split with queries drawn from the BENCHMARK side
    (decontam.synthesize_eval_split), not the corpus vocabulary head: the
    corpus-mining / contamination-sweep shape, where query terms come from
    an out-of-corpus eval suite.

    Term selection: top NQ*TPQ bench bigrams by (bench df desc, token asc),
    gated by TRAIN-side rarity (coalesce(train df, 0) * BM25_MAXDF_MULT <=
    n_train) so stopword-grade terms are excluded by the retrieval corpus's
    own statistics — the bench-frequency gate would wrongly drop the
    planted passage (df_bench = n_bench by construction). A bench term
    absent from train joins no tf rows and retrieves nothing, exactly the
    out-of-corpus behaviour this variant exists to exercise; the planted
    passage bigrams DO occur in the contaminated train docs, which the
    ranking surfaces.

    Scale shape identical to bm25_topk: the train corpus is reduced to the
    checkpointed tf relation once; the bench side is benchmark-sized by
    nature; ranking is the same salted two-stage exact top-k."""
    tf, dl, stats, terms = _bench_query_plan(documents)
    return _score_topk(tf, dl, stats, terms, topk, salt)


def _bench_query_plan(documents: DataFrame):
    """(train tf, dl, stats, terms) for the bench-query variant — shared by
    bm25_bench_topk and the term-inspection surface bm25_bench_terms."""
    from .decontam import synthesize_eval_split

    split = synthesize_eval_split(documents)
    train = split.filter(F.col("role") == "train").select(
        "doc_id", F.col("text2").alias("text")
    )
    bench = split.filter(F.col("role") == "bench").select(
        "doc_id", F.col("text2").alias("text")
    )
    tf = _bigram_tf(train).localCheckpoint(eager=False)
    dl, dfc, stats = _tf_stats(tf)
    bdf = (
        _bigram_tf(bench)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("bench_df"))
    )
    n_terms_total = BM25_NQ * BM25_TPQ
    cand = (
        bdf.join(dfc, "token", "left")
        .join(F.broadcast(stats))
        .filter(
            F.coalesce(F.col("doc_freq"), F.lit(0)) * BM25_MAXDF_MULT
            <= F.col("n_docs")
        )
    )
    head = cand.orderBy(
        F.desc("bench_df"), F.asc("token")
    ).limit(n_terms_total)
    # bounded NQ*TPQ-row frame, same guardrail as bm25_topk
    wq = Window.orderBy(F.desc("bench_df"), F.asc("token"))
    terms = head.withColumn("_rk", F.row_number().over(wq)).select(
        F.expr(f"(_rk - 1) div {BM25_TPQ}").cast("long").alias("query_id"),
        "token",
        F.coalesce(F.col("doc_freq"), F.lit(0)).alias("doc_freq"),
    )
    return tf, dl, stats, terms


def bm25_bench_terms(documents: DataFrame) -> DataFrame:
    """(query_id, token, doc_freq) — the bench-derived query-term relation
    (inspection/debug surface; the same plan bm25_bench_topk scores)."""
    return _bench_query_plan(documents)[3]


def sql_bm25_topk(table: str = "documents", topk: int = BM25_TOPK) -> str:
    """DuckDB mirror: same query derivation and integer scoring; the
    salt-invariant final semantics need only ONE window here."""
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    s16 = (
        "(16 * (length(bin(_idf_q)) - 1)"
        f" + ((_idf_q * 16) >> (length(bin(_idf_q)) - 1)) - {bias})"
    )
    k1, b = BM25_K1_MILLI, BM25_B_MILLI
    n_terms_total = BM25_NQ * BM25_TPQ
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(lower(text), ' ') AS ws
  FROM {table} WHERE len(string_split(lower(text), ' ')) >= 2
),
tok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS token
  FROM d
),
tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
dfc AS (SELECT token, COUNT(*)::BIGINT AS doc_freq FROM tf GROUP BY token),
stats AS (SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS total_toks FROM dl),
terms AS (
  SELECT ((rk - 1) // {BM25_TPQ})::BIGINT AS query_id, token, doc_freq FROM (
    SELECT token, doc_freq,
           ROW_NUMBER() OVER (ORDER BY doc_freq DESC, token ASC) AS rk
    FROM dfc CROSS JOIN stats
    WHERE doc_freq * {BM25_MAXDF_MULT} <= n_docs
  ) WHERE rk <= {n_terms_total}
),
scored AS (
  SELECT t.query_id, f.doc_id, f.tf, t.doc_freq, d.dl, s.n_docs,
         (s.total_toks * 1000) // s.n_docs AS _avgdl_m
  FROM tf f JOIN terms t USING (token)
            JOIN dl d USING (doc_id)
            CROSS JOIN stats s
),
parts AS (
  SELECT query_id, doc_id,
         GREATEST(1, ((2 * n_docs - 2 * doc_freq + 1) * {LM_PRESCALE})
                     // (2 * doc_freq + 1)) AS _idf_q,
         (tf * {k1 + 1000} * 1000)
           // (tf * 1000 + ({k1} * (1000 - {b}
                + ({b} * dl * 1000) // _avgdl_m)) // 1000) AS _tfpart_m
  FROM scored
),
qd AS (
  SELECT query_id, doc_id,
         SUM(GREATEST(0, {s16}) * _tfpart_m)::BIGINT AS score_milli,
         COUNT(*)::BIGINT AS n_terms
  FROM parts GROUP BY query_id, doc_id
)
SELECT query_id, ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY score_milli DESC, doc_id ASC
       )::BIGINT AS rank,
       doc_id, score_milli, n_terms
FROM qd
QUALIFY rank <= {topk}
ORDER BY query_id, rank
"""


def sql_bm25_bench_topk(table: str = "documents", topk: int = BM25_TOPK) -> str:
    """DuckDB mirror of bm25_bench_topk: the decontam eval-split CTE, train
    tf/df/len censuses, bench-bigram term heads gated by train rarity, same
    integer scoring, ONE final ranking window."""
    from .decontam import _sql_split

    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    s16 = (
        "(16 * (length(bin(_idf_q)) - 1)"
        f" + ((_idf_q * 16) >> (length(bin(_idf_q)) - 1)) - {bias})"
    )
    k1, b = BM25_K1_MILLI, BM25_B_MILLI
    n_terms_total = BM25_NQ * BM25_TPQ
    return f"""
WITH {_sql_split(table)},
d AS (
  SELECT doc_id, string_split(lower(text2), ' ') AS ws
  FROM split WHERE role = 'train'
    AND len(string_split(lower(text2), ' ')) >= 2
),
bd AS (
  SELECT doc_id, string_split(lower(text2), ' ') AS ws
  FROM split WHERE role = 'bench'
    AND len(string_split(lower(text2), ' ')) >= 2
),
tok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS token
  FROM d
),
btok AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS token
  FROM bd
),
tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
dfc AS (SELECT token, COUNT(*)::BIGINT AS doc_freq FROM tf GROUP BY token),
bdf AS (
  SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS bench_df
  FROM btok GROUP BY token
),
stats AS (SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS total_toks FROM dl),
terms AS (
  SELECT ((rk - 1) // {BM25_TPQ})::BIGINT AS query_id, token, doc_freq FROM (
    SELECT b.token, COALESCE(f.doc_freq, 0) AS doc_freq,
           ROW_NUMBER() OVER (ORDER BY b.bench_df DESC, b.token ASC) AS rk
    FROM bdf b LEFT JOIN dfc f USING (token) CROSS JOIN stats
    WHERE COALESCE(f.doc_freq, 0) * {BM25_MAXDF_MULT} <= n_docs
  ) WHERE rk <= {n_terms_total}
),
scored AS (
  SELECT t.query_id, f.doc_id, f.tf, t.doc_freq, d.dl, s.n_docs,
         (s.total_toks * 1000) // s.n_docs AS _avgdl_m
  FROM tf f JOIN terms t USING (token)
            JOIN dl d USING (doc_id)
            CROSS JOIN stats s
),
parts AS (
  SELECT query_id, doc_id,
         GREATEST(1, ((2 * n_docs - 2 * doc_freq + 1) * {LM_PRESCALE})
                     // (2 * doc_freq + 1)) AS _idf_q,
         (tf * {k1 + 1000} * 1000)
           // (tf * 1000 + ({k1} * (1000 - {b}
                + ({b} * dl * 1000) // _avgdl_m)) // 1000) AS _tfpart_m
  FROM scored
),
qd AS (
  SELECT query_id, doc_id,
         SUM(GREATEST(0, {s16}) * _tfpart_m)::BIGINT AS score_milli,
         COUNT(*)::BIGINT AS n_terms
  FROM parts GROUP BY query_id, doc_id
)
SELECT query_id, ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY score_milli DESC, doc_id ASC
       )::BIGINT AS rank,
       doc_id, score_milli, n_terms
FROM qd
QUALIFY rank <= {topk}
ORDER BY query_id, rank
"""
