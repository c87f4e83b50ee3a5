"""Text-analysis operators over the `documents` table.

Pure Column expressions (whole-stage-codegen friendly, zero shuffle):
- language ID: stopword-lexicon hit counts, deterministic argmax
- BPE-ish tokenization: letter-runs / digit-runs / punct-runs regex
- rolling-hash fingerprint: Horner fold over word hashes mod P31
(quality scoring and whitespace tokenization live in queries.py since r1)

Plus the one shuffle-bearing member: the unigram-LM perplexity filter
(one token-census groupBy + a capped-vocabulary broadcast join — see the
section comment at the bottom of the file).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import P31

LEXICONS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
}
LANG_ORDER = ("en", "es", "fr", "de")

BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"
HORNER_BASE = 31


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, score) — argmax of lexicon hits, ties resolved in
    LANG_ORDER."""
    words = F.split(F.lower(F.col("text")), " ")

    def hit_count(lex):
        return F.size(F.filter(words, lambda w: w.isin(*lex)))

    scores = {lang: hit_count(lex) for lang, lex in LEXICONS.items()}

    pred = None
    best = None
    for lang in reversed(LANG_ORDER):
        if pred is None:
            pred = F.lit(lang)
            best = scores[lang]
        else:
            cond = scores[lang] >= best
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
            best = F.when(cond, scores[lang]).otherwise(best)
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        pred.alias("pred_lang"),
        best.cast("int").alias("score"),
    )


def sql_language_id(table: str = "documents") -> str:
    def hits(lex):
        inl = ", ".join(f"'{w}'" for w in lex)
        return (
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({inl})))"
        )

    s = {lang: hits(lex) for lang, lex in LEXICONS.items()}
    # same right-to-left fold as the Spark side
    pred = f"'{LANG_ORDER[-1]}'"
    best = s[LANG_ORDER[-1]]
    for lang in reversed(LANG_ORDER[:-1]):
        pred = f"CASE WHEN {s[lang]} >= {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN {s[lang]} >= {best} THEN {s[lang]} ELSE {best} END"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, {pred} AS pred_lang,
       CAST({best} AS INT) AS score
FROM {table}
"""


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_alpha, n_num) under the BPE-ish regex."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))).alias("n_alpha"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).alias("n_num"),
    )


def sql_bpe_token_stats(table: str = "documents") -> str:
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_tokens,
       len(list_filter(regexp_extract_all(text, '{BPE_PATTERN}'),
           t -> regexp_matches(t, '^[A-Za-z]+$'))) AS n_alpha,
       len(list_filter(regexp_extract_all(text, '{BPE_PATTERN}'),
           t -> regexp_matches(t, '^[0-9]+$'))) AS n_num
FROM {table}
"""


def rolling_fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — order-sensitive Horner fold of word hashes:
    fp = fold(acc*31 + h31(word)) mod P31. Exact integers on both engines."""
    words = F.split(F.col("text"), " ")
    hs = F.transform(
        words,
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long") % P31,
    )
    fp = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * HORNER_BASE + h) % P31,
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), fp.alias("fingerprint")
    )


def sql_rolling_fingerprint(table: str = "documents") -> str:
    hs = (
        "list_transform(string_split(text, ' '), "
        f"w -> ((('0x' || substr(md5(w),1,15))::BIGINT) % {P31}))"
    )
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       list_reduce(list_concat([0::BIGINT], {hs}),
                   (acc, h) -> (acc * {HORNER_BASE} + h) % {P31}) AS fingerprint
FROM {table}
"""


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, the
    repetition-removal rules of a training-data quality filter), per
    document with ZERO shuffle: top-2-gram fraction and duplicated-3-gram
    fraction. The corpus documents are single-line, so the line-level dup
    signals are vacuous here; the n-gram pair are the load-bearing ones.

    Scale shape: a naive formulation explodes n-grams and double-groupBys
    (doc_id, gram) — two wide shuffles whose key count is ~total corpus
    tokens. The per-document statistic needs neither: sort the gram array
    in place and fold run lengths with F.aggregate, all whole-stage
    codegen, narrow end to end."""
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)

    def grams(k: int):
        g = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + off) for off in range(k)]
            ),
        )
        # sequence(1, n-k+1) DESCENDS when n < k — guard to an empty array
        return F.when(n >= k, F.array_sort(g)).otherwise(
            F.array().cast("array<string>")
        )

    def max_run(sorted_arr):
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"), run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])

    def dup_members(sorted_arr):
        """Count of elements belonging to runs of length > 1."""
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("dup")
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            add = (
                F.when(run == 2, F.lit(2))  # both members turn duplicate
                .when(run > 2, F.lit(1))
                .otherwise(F.lit(0))
            )
            return F.struct(
                x.alias("prev"), run.alias("run"), (acc["dup"] + add).alias("dup")
            )

        return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["dup"])

    top2 = max_run(grams(2))
    dup3 = dup_members(grams(3))
    return documents.select(
        "doc_id",
        top2.cast("int").alias("top_bigram_count"),
        F.round(top2 / F.greatest(n - 1, F.lit(1)), 4).alias("top_bigram_frac"),
        F.round(dup3 / F.greatest(n - 2, F.lit(1)), 4).alias("dup_trigram_frac"),
    )


def sql_repetition_stats(table: str = "documents") -> str:
    """Independent formulation: explode n-grams, GROUP BY (doc, gram) —
    fine for the oracle at fixture scale, exactly the shuffle shape the
    Spark side avoids."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM {table}),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
  FROM t, unnest(range(1, n)) u(i) WHERE n >= 2),
bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bga AS (SELECT doc_id, MAX(c) AS topc FROM bgc GROUP BY 1),
tg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM t, unnest(range(1, n - 1)) u(i) WHERE n >= 3),
tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
tga AS (SELECT doc_id, COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup
        FROM tgc GROUP BY 1)
SELECT t.doc_id,
  CAST(COALESCE(bga.topc, 0) AS INT) AS top_bigram_count,
  ROUND(COALESCE(bga.topc, 0) * 1.0 / GREATEST(t.n - 1, 1), 4) AS top_bigram_frac,
  ROUND(COALESCE(tga.dup, 0) * 1.0 / GREATEST(t.n - 2, 1), 4) AS dup_trigram_frac
FROM t LEFT JOIN bga USING (doc_id) LEFT JOIN tga USING (doc_id)
"""


# ---------------------------------------------------------------------------
# unigram-LM perplexity quality filter (CCNet's missing half next to the
# Gopher gates, round-3 verdict task 7). CCNet scores documents with a
# pretrained KenLM and drops the high-perplexity tail; this engine trains
# the unigram model from the corpus itself (one census shuffle — the same
# shape as the boilerplate census) and scores every document against it.
#
# Float trap, solved with integer fixed-point log2: Spark's log2 is
# java.lang.Math-based and DuckDB's is libm-based — the two can disagree by
# 1 ulp, which flips floor() at bucket boundaries and breaks the driver's
# value-hash gate. So surprisal is computed ENTIRELY in int64:
#   q   = (T * PRESCALE) // c            (exact integer ratio, >= PRESCALE)
#   e0  = length(bin(q)) - 1             (exact floor(log2 q) via the binary
#                                         string — no float log anywhere)
#   m16 = (q * 16) >> e0                 (top 4 mantissa bits, in [16, 32))
#   s16 = 16*e0 + m16 - 16 - 16*log2(PRESCALE)
# s16 is the classic "exponent + linear mantissa" log2 in 1/16-bit units
# (error <= ~0.18 bits: 0.086 linear-mantissa bias + 0.088 four-bit floor,
# weakly monotone in q); both engines produce bit-identical values because
# every step is int64 arithmetic.
#
# Scale shape: census = ONE groupBy(token) shuffle; the LM is the top
# VOCAB_CAP tokens (HARD cap, deterministic count-desc/token-asc order —
# the broadcast is provably bounded, satisfying the scale lint); corpus
# total T rides a 1-row crossJoin; scoring is a broadcast join + one
# groupBy(doc_id). OOV tokens score as singleton events (c = OOV_COUNT).
# int64 headroom: T * PRESCALE overflows past ~9e15 tokens — at that scale
# shard the census or raise to a 128-bit fold (documented dial).

VOCAB_CAP = 4096      # LM vocabulary size — the broadcast's hard cap
OOV_COUNT = 1         # unseen tokens modeled as count-1 events
LM_PRESCALE = 1024    # keeps >= 10 ratio bits before the integer log
PPX_GATE_Q4 = 224     # flag when mean surprisal > 14.0 bits (224 / 16)


def _surprisal16(q):
    """1/16-bit fixed-point log2 of integer column q (>= 1), minus the
    LM_PRESCALE bias. Pure int64 — bit-identical on Spark and DuckDB."""
    e0 = F.expr("length(bin(_lm_q)) - 1")
    m16 = F.expr("shiftright(_lm_q * 16, length(bin(_lm_q)) - 1)")
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    return 16 * e0 + m16 - F.lit(bias)


def unigram_perplexity(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_surprisal_q4, ppx_flag) for every document
    with >= 1 whitespace token. mean_surprisal_q4 is the per-token average
    surprisal under the corpus-trained unigram LM, in 1/16-bit units
    (perplexity = 2^(mean_surprisal_q4 / 16)); ppx_flag marks the
    high-perplexity tail a CCNet-style hygiene pass drops."""
    tok = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    census = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # census feeds TWO consumers (the vocab top-K and the corpus total);
    # without this the plan re-explodes and re-aggregates the whole corpus
    # once per consumer (verified via explain: two census Exchanges). The
    # census is corpus-REDUCED (distinct tokens), so checkpointing it is
    # the cheap side of the dedup-module rule: checkpoint reduced
    # multi-consumer frames, never corpus-exploded ones.
    census = census.localCheckpoint(eager=False)
    vocab = census.orderBy(F.desc("c"), F.asc("token")).limit(VOCAB_CAP)
    total = census.agg(F.sum("c").alias("_lm_t"))
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(total)  # 1-row frame; AQE broadcasts it at runtime
        .withColumn(
            "_lm_q",
            F.expr(
                f"(_lm_t * {LM_PRESCALE}) div coalesce(c, {OOV_COUNT})"
            ).cast("long"),
        )
        .withColumn("_lm_s16", _surprisal16(F.col("_lm_q")).cast("long"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_lm_s16").alias("_lm_sum"),
    )
    mean = F.expr("_lm_sum div n_tokens").cast("long")
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        mean.alias("mean_surprisal_q4"),
        (mean > PPX_GATE_Q4).alias("ppx_flag"),
    )


def sql_unigram_perplexity(table: str = "documents") -> str:
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    return f"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(lower(text), ' ')) AS token
    FROM {table}
  ) WHERE token <> ''
),
census AS (SELECT token, COUNT(*)::BIGINT AS c FROM tok GROUP BY token),
vocab AS (SELECT token, c FROM census ORDER BY c DESC, token ASC LIMIT {VOCAB_CAP}),
total AS (SELECT SUM(c)::BIGINT AS t FROM census),
scored AS (
  SELECT tok.doc_id,
         ((total.t * {LM_PRESCALE}) // COALESCE(vocab.c, {OOV_COUNT}))::BIGINT AS q
  FROM tok LEFT JOIN vocab USING (token) CROSS JOIN total
),
s AS (
  SELECT doc_id,
         (16 * (length(bin(q)) - 1)
          + ((q * 16) >> (length(bin(q)) - 1)) - {bias})::BIGINT AS s16
  FROM scored
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_tokens,
       (SUM(s16)::BIGINT // COUNT(*)::BIGINT)::BIGINT AS mean_surprisal_q4,
       (SUM(s16)::BIGINT // COUNT(*)::BIGINT) > {PPX_GATE_Q4} AS ppx_flag
FROM s GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Bigram LM perplexity with STUPID BACKOFF (Brants et al. 2007, "Large
# Language Models in Machine Translation" — the web-scale n-gram scheme:
# no discounting, a fixed backoff penalty, counts only). This is the n=2
# member of the CCNet/KenLM quality-signal family one tier above the
# unigram gate: P(w_i | w_{i-1}) = c(ab)/c(a) when the bigram is in the LM,
# else alpha * P_uni(w_i). Surprisal stays in the same 1/16-bit int64
# fixed point as unigram_perplexity, so Spark == DuckDB bit-exactly (the
# backoff penalty -log2(alpha) is an integer constant added to the unigram
# surprisal on the backoff path).
#
# Scale shape: TWO censuses (token and bigram; each ONE groupBy with
# map-side combine over the exploded stream), both LMs HARD-capped
# (VOCAB_CAP / BIGRAM_CAP top rows by deterministic count-desc order — the
# broadcasts are provably bounded), the bigram LM carries its context
# count c(a) via a census-to-census join (vocab-sized, never the corpus),
# corpus total T rides a 1-row crossJoin, scoring is broadcast joins + one
# groupBy(doc_id). Three corpus passes total (two censuses + scoring) —
# the train-then-serve reality of any counting LM. int64 headroom is the
# unigram gate's: T * PRESCALE < 2^63 (~9e15 tokens; shard past that).

BIGRAM_CAP = 512         # bigram LM size — the broadcast's hard cap. The
#                          fixture corpus has 916 bigram types, so this
#                          sandbox value makes the backoff path real (the
#                          tail 400 types back off); production runs
#                          10^7-10^9 with the LM as a stored census table
#                          (shuffle join) once it outgrows a broadcast —
#                          same dial as the incremental-dedup history side
BACKOFF_PENALTY16 = 21   # -log2(alpha), alpha = 0.4 (Brants' S(.)), 1/16-bit
BIPPX_GATE_Q4 = 84       # flag when mean surprisal > 5.25 bits — the
#                          bigram LM sits far below the unigram gate (224):
#                          in-LM positions cost log2(c(a)/c(ab)), and the
#                          gate splits the fixture on backoff density


def bigram_perplexity(documents: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, n_backoff, mean_surprisal_q4, ppx_flag) for
    every document with >= 2 whitespace tokens. mean_surprisal_q4 averages
    per-position surprisal of P(cur | prev) under the corpus-trained
    stupid-backoff bigram LM in 1/16-bit units; n_backoff counts positions
    that fell back to the unigram path (bigram outside the capped LM);
    ppx_flag marks the high-perplexity tail, same gate constant as the
    unigram pass (a backed-off stopword corpus scores higher there —
    that asymmetry is the point of the stronger model)."""
    # bigrams via zip_with over two slices of a MATERIALIZED words column
    # (the DSIR de-quadratification: element_at inside a lambda re-evaluates
    # the split per element)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    docs = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), words.alias("_w")
    ).filter(F.size("_w") >= 2)
    pairs = F.zip_with(
        F.slice("_w", 1, F.size("_w") - 1),
        F.slice("_w", 2, F.size("_w") - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    pos = docs.select("doc_id", F.explode(pairs).alias("pc")).select(
        "doc_id", F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur")
    )

    # token census over ALL tokens (not just bigram positions): c(a) is the
    # classic context count, and the unigram backoff LM is the same model
    # unigram_perplexity serves. Feeds three consumers (vocab cap, total,
    # bigram-LM context join) -> checkpoint the REDUCED frame, per the rule.
    tok = documents.select(
        F.explode(F.filter(F.split(F.lower("text"), " "), lambda w: w != "")).alias(
            "token"
        )
    )
    census = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    census = census.localCheckpoint(eager=False)
    vocab = census.orderBy(F.desc("c"), F.asc("token")).limit(VOCAB_CAP)
    total = census.agg(F.sum("c").alias("_lm_t"))

    bi_census = pos.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_ab"))
    bi_lm = (
        bi_census.orderBy(F.desc("c_ab"), F.asc("prev"), F.asc("cur"))
        .limit(BIGRAM_CAP)
        .join(census.select(F.col("token").alias("prev"),
                            F.col("c").alias("c_prev")), "prev")
    )

    scored = (
        pos.join(F.broadcast(bi_lm), ["prev", "cur"], "left")
        .join(
            F.broadcast(vocab.select(F.col("token").alias("cur"),
                                     F.col("c").alias("c_cur"))),
            "cur",
            "left",
        )
        .crossJoin(total)  # 1-row frame; AQE broadcasts it at runtime
        .withColumn(
            "_lm_q",
            F.when(
                F.col("c_ab").isNotNull(),
                F.expr(f"(c_prev * {LM_PRESCALE}) div c_ab"),
            )
            .otherwise(
                F.expr(f"(_lm_t * {LM_PRESCALE}) div coalesce(c_cur, {OOV_COUNT})")
            )
            .cast("long"),
        )
        .withColumn(
            "_lm_s16",
            (
                _surprisal16(F.col("_lm_q"))
                + F.when(F.col("c_ab").isNull(), BACKOFF_PENALTY16).otherwise(0)
            ).cast("long"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("c_ab").isNull().cast("long")).alias("n_backoff"),
        F.sum("_lm_s16").alias("_lm_sum"),
    )
    mean = F.expr("_lm_sum div n_bigrams").cast("long")
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_backoff").cast("long").alias("n_backoff"),
        mean.alias("mean_surprisal_q4"),
        (mean > BIPPX_GATE_Q4).alias("ppx_flag"),
    )


def sql_bigram_perplexity(table: str = "documents") -> str:
    """DuckDB mirror: parallel unnest zips the two shifted projections of
    the words list into (prev, cur) positions; same capped LMs, same int64
    log2, same backoff constant."""
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    return f"""
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws
  FROM {table}
),
tok AS (SELECT unnest(ws) AS token FROM w),
census AS (SELECT token, COUNT(*)::BIGINT AS c FROM tok GROUP BY token),
vocab AS (SELECT token, c FROM census ORDER BY c DESC, token ASC LIMIT {VOCAB_CAP}),
total AS (SELECT SUM(c)::BIGINT AS t FROM census),
pos AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS prev,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS cur
  FROM w WHERE len(ws) >= 2
),
bi AS (
  SELECT prev, cur, c_ab, census.c AS c_prev FROM (
    SELECT prev, cur, COUNT(*)::BIGINT AS c_ab
    FROM pos GROUP BY prev, cur
    ORDER BY c_ab DESC, prev ASC, cur ASC LIMIT {BIGRAM_CAP}
  ) JOIN census ON census.token = prev
),
scored AS (
  SELECT pos.doc_id,
         CASE WHEN bi.c_ab IS NOT NULL
              THEN (bi.c_prev * {LM_PRESCALE}) // bi.c_ab
              ELSE (total.t * {LM_PRESCALE}) // COALESCE(vocab.c, {OOV_COUNT})
         END::BIGINT AS q,
         (bi.c_ab IS NULL) AS backed
  FROM pos LEFT JOIN bi ON bi.prev = pos.prev AND bi.cur = pos.cur
           LEFT JOIN vocab ON vocab.token = pos.cur
           CROSS JOIN total
),
s AS (
  SELECT doc_id, backed,
         (16 * (length(bin(q)) - 1)
          + ((q * 16) >> (length(bin(q)) - 1)) - {bias}
          + CASE WHEN backed THEN {BACKOFF_PENALTY16} ELSE 0 END)::BIGINT AS s16
  FROM scored
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_bigrams,
       SUM(CASE WHEN backed THEN 1 ELSE 0 END)::BIGINT AS n_backoff,
       (SUM(s16)::BIGINT // COUNT(*)::BIGINT)::BIGINT AS mean_surprisal_q4,
       (SUM(s16)::BIGINT // COUNT(*)::BIGINT) > {BIPPX_GATE_Q4} AS ppx_flag
FROM s GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): per-doc log importance ratio
# log p_target(doc) - log p_raw(doc) under two hashed-bigram LMs — the
# target LM trained on an in-domain subset, the raw LM on the whole corpus.
# Pure counting + the same int64 fixed-point log2 as the perplexity gate,
# so Spark == DuckDB bit-exactly.
#
# The driver fixture's text is the same word distribution for every doc
# (its lang column is an independent label), so a real in-domain subset
# cannot exist in it; same pattern as the webclean/semantic synthesizers —
# synthesize_dsir_corpus plants the structure the operator exists for (an
# md5-selected ~1/4 of docs carries an appended domain-marker phrase and
# plays the curated target set) and the DuckDB oracle rebuilds the
# identical corpus independently.
#
# Scale shape: ONE explode + two bucket censuses (both HARD-capped at
# DSIR_BUCKETS rows — the hashed feature space, broadcastable by
# construction), totals ride 1-row crossJoins, scoring is broadcast joins +
# one groupBy(doc_id). The corpus is never regrouped; the 10^12-doc cost is
# the same as one wordcount.

DSIR_BUCKETS = 65536   # hashed-bigram feature space (paper: 10^4; wider
#                        here so sandbox-corpus collisions don't blur the
#                        domain signal — still a hard broadcast cap)
DSIR_TARGET_MOD = 4    # md5-selected ~1/4 of docs plays the target domain
DSIR_MARKER = (
    "quantum flux lattice boson spectral manifold tensor entropy "
    "geodesic spinor quark hadron fermion gauge soliton vortex "
    "eigenmode laplacian curvature homology functor sheaf operad monad "
    "isometry holonomy torsion fibration cobordism spectra moduli stack"
)  # 32 tokens outside the base vocabulary -> 31 target-exclusive bigrams


def synthesize_dsir_corpus(documents: DataFrame) -> DataFrame:
    """(doc_id, is_target, text) — the fixture corpus with a deterministic
    in-domain subset planted: docs with md5('dsirt|'||doc_id) % MOD == 0
    get DSIR_MARKER appended and form the target set."""
    doc_id = F.col("doc_id").cast("string")
    sel = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsirt|"), doc_id)), 1, 4), 16, 10
        ).cast("long")
        % DSIR_TARGET_MOD
        == 0
    )
    return documents.select(
        doc_id.alias("doc_id"),
        sel.alias("is_target"),
        F.when(sel, F.concat(F.col("text"), F.lit(" " + DSIR_MARKER)))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def sql_synthesize_dsir(table: str = "documents") -> str:
    sel = (
        "(('0x' || substr(md5('dsirt|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT"
        f" % {DSIR_TARGET_MOD} = 0)"
    )
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, {sel} AS is_target,
       CASE WHEN {sel} THEN text || ' {DSIR_MARKER}' ELSE text END AS text
FROM {table}
"""


def _s16_of(col_name: str):
    """1/16-bit int64 log2 of integer column `col_name` (>= 1), minus the
    LM_PRESCALE bias — the generic-column twin of _surprisal16."""
    e0 = F.expr(f"length(bin({col_name})) - 1")
    m16 = F.expr(f"shiftright({col_name} * 16, length(bin({col_name})) - 1)")
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    return 16 * e0 + m16 - F.lit(bias)


def dsir_weights(documents: DataFrame) -> DataFrame:
    """(doc_id, n_grams, dsir_logratio_q4, dsir_keep) for every doc with
    >= 1 bigram. dsir_logratio_q4 is the summed per-bigram
    [surprisal_raw - surprisal_target] in 1/16-bit units (higher = the doc
    looks more like the target domain relative to the raw corpus);
    dsir_keep flags docs whose PER-BIGRAM mean log-ratio exceeds the
    corpus per-bigram mean (length-normalized, so short off-domain docs
    don't out-rank long in-domain ones) — an exact integer cross-multiply
    (w * total_grams > sum_w * n_grams; never a negative integer division,
    where Spark's truncating div and DuckDB's flooring // disagree).
    Headroom: |w| < 2^13 q4/gram * n_grams keeps both products under 2^63
    through ~10^13 corpus grams; past that, compare per-shard (documented
    dial). The flag is the deterministic stand-in for the paper's Gumbel
    resampling (compose with hash_sample for a sized cut)."""
    corpus = synthesize_dsir_corpus(documents)
    # bigrams via zip_with over two slices of a MATERIALIZED words column:
    # element_at(words, i) inside a transform re-evaluates the split+filter
    # expression per gram element (no CSE across lambda scopes) — O(n^2)
    # per doc, measured as the whole operator's hot spot at sf0.1. The
    # slice/zip_with form is linear and touches the array exactly twice.
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    grams = F.when(
        F.size("_w") >= 2,
        F.zip_with(
            F.slice("_w", 1, F.size("_w") - 1),
            F.slice("_w", 2, F.size("_w") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = corpus.select(
        "doc_id", "is_target", words.alias("_w")
    ).select(
        "doc_id",
        "is_target",
        F.explode(grams).alias("gram"),
    ).select(
        "doc_id",
        "is_target",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dsir|"), F.col("gram"))), 1, 8),
                16,
                10,
            ).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    # ONE census with both LM counts (c_tgt as a conditional sum), so the
    # corpus-exploded `ex` is evaluated exactly twice (census + scoring)
    # instead of once per LM/total/join consumer — measured 10.0 -> ~4s at
    # sf0.1. The census is corpus-REDUCED (<= DSIR_BUCKETS rows, the hard
    # cap), so checkpointing it is the cheap side of the checkpoint rule;
    # both totals then fold over the census, never re-touching ex.
    census = ex.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_tgt"),
    )
    census = census.localCheckpoint(eager=False)
    totals = census.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    scored = (
        ex.join(F.broadcast(census), "b")  # bounded: <= DSIR_BUCKETS rows
        .crossJoin(totals)
        .withColumn(
            "_q_raw",
            F.expr(
                f"((t_raw + {DSIR_BUCKETS}) * {LM_PRESCALE}) div (c_raw + 1)"
            ).cast("long"),
        )
        .withColumn(
            "_q_tgt",
            F.expr(
                f"((t_tgt + {DSIR_BUCKETS}) * {LM_PRESCALE}) div (c_tgt + 1)"
            ).cast("long"),
        )
        .withColumn("_d16", (_s16_of("_q_raw") - _s16_of("_q_tgt")).cast("long"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_d16").alias("_w"),
    )
    # agg feeds the corpus-mean stats AND the final select; one row per doc
    agg = agg.localCheckpoint(eager=False)
    stats = agg.agg(
        F.sum("n_grams").alias("_tg"), F.sum("_w").alias("_sw")
    )
    return agg.crossJoin(stats).select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("_w").cast("long").alias("dsir_logratio_q4"),
        (F.col("_w") * F.col("_tg") > F.col("_sw") * F.col("n_grams")).alias(
            "dsir_keep"
        ),
    )


def sql_dsir_weights(table: str = "documents") -> str:
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)

    def s16(q):
        return (
            f"(16 * (length(bin({q})) - 1)"
            f" + (({q} * 16) >> (length(bin({q})) - 1)) - {bias})"
        )

    return f"""
WITH corpus AS ({sql_synthesize_dsir(table)}),
ex AS (
  SELECT doc_id, is_target,
         (('0x' || substr(md5('dsir|' || gram), 1, 8))::BIGINT % {DSIR_BUCKETS}) AS b
  FROM (
    SELECT doc_id, is_target,
           unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i + 1])) AS gram
    FROM (
      SELECT doc_id, is_target,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM corpus
    )
  )
),
raw AS (SELECT b, COUNT(*)::BIGINT AS c_raw FROM ex GROUP BY b),
tgt AS (SELECT b, COUNT(*)::BIGINT AS c_tgt FROM ex WHERE is_target GROUP BY b),
t_raw AS (SELECT SUM(c_raw)::BIGINT AS t_raw FROM raw),
t_tgt AS (SELECT SUM(c_tgt)::BIGINT AS t_tgt FROM tgt),
scored AS (
  SELECT ex.doc_id,
         ((t_raw.t_raw + {DSIR_BUCKETS}) * {LM_PRESCALE}) // (raw.c_raw + 1) AS _q_raw,
         ((t_tgt.t_tgt + {DSIR_BUCKETS}) * {LM_PRESCALE}) // (COALESCE(tgt.c_tgt, 0) + 1) AS _q_tgt
  FROM ex JOIN raw USING (b) LEFT JOIN tgt USING (b)
  CROSS JOIN t_raw CROSS JOIN t_tgt
),
agg AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_grams,
         SUM({s16('_q_raw')} - {s16('_q_tgt')})::BIGINT AS w
  FROM scored GROUP BY doc_id
),
stats AS (SELECT SUM(n_grams)::BIGINT AS tg, SUM(w)::BIGINT AS sw FROM agg)
SELECT doc_id, n_grams, w AS dsir_logratio_q4,
       (w * tg > sw * n_grams) AS dsir_keep
FROM agg CROSS JOIN stats
"""


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting High
# Quality Monolingual Datasets from Web Crawl Data"): split the corpus into
# head / middle / tail terciles by LM perplexity — the paper keeps "head"
# (lowest perplexity = most fluent) for pretraining and drops or
# down-weights the tail. Composes the unigram perplexity gate with the
# histogram-quantile kernel from text_length_quantiles: tercile thresholds
# come from a cumulative sum over the BOUNDED per-doc-score histogram
# (mean_surprisal_q4 is an int in a few-thousand-value domain), never a
# global row sort.
#
# Scale shape: unigram_perplexity's cost (one wordcount) + one groupBy over
# the bounded score domain + a 1-row threshold crossJoin. The per-doc frame
# feeds two consumers (the histogram and the final labeling), so it is
# localCheckpoint'ed — without it the whole corpus explode/LM join
# re-evaluates per consumer (the perplexity census rule).

PPL_BUCKETS = 3  # CCNet's head/middle/tail


def ppl_buckets(documents: DataFrame) -> DataFrame:
    """(doc_id, mean_surprisal_q4, ppl_bucket) — ppl_bucket in
    {'head','middle','tail'}: head = lowest-perplexity tercile. Threshold
    rule: bucket b covers scores <= the smallest value whose cumulative doc
    count reaches ceil(b * N / 3) (exact integer rule, engine-independent;
    ties on the boundary value all land in the lower bucket, so terciles
    are approximately-equal exactly like CCNet's hashed split)."""
    ppl = unigram_perplexity(documents).select("doc_id", "mean_surprisal_q4")
    ppl = ppl.localCheckpoint(eager=False)
    hist = ppl.groupBy(F.col("mean_surprisal_q4").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # BOUNDED single-partition window: input is the score histogram
    # (|distinct q4 scores| <= a few thousand), not the corpus — same
    # allowlisted pattern as text_length_quantiles.
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "v", F.sum("c").over(w).alias("cum"), F.sum("c").over(wt).alias("total")
    )
    t1 = cum.filter(
        F.col("cum") >= F.ceil(F.col("total") * F.lit(1) / F.lit(3.0))
    ).agg(F.min("v").alias("t1"))
    t2 = cum.filter(
        F.col("cum") >= F.ceil(F.col("total") * F.lit(2) / F.lit(3.0))
    ).agg(F.min("v").alias("t2"))
    return (
        ppl.crossJoin(t1)  # 1-row frames; AQE broadcasts at runtime
        .crossJoin(t2)
        .select(
            "doc_id",
            "mean_surprisal_q4",
            F.when(F.col("mean_surprisal_q4") <= F.col("t1"), F.lit("head"))
            .when(F.col("mean_surprisal_q4") <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


def sql_ppl_buckets(table: str = "documents") -> str:
    return f"""
WITH ppl AS (
  SELECT doc_id, mean_surprisal_q4 FROM ({sql_unigram_perplexity(table)})
),
hist AS (SELECT mean_surprisal_q4 AS v, COUNT(*) AS c FROM ppl GROUP BY 1),
cum AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS total FROM hist
),
t1 AS (SELECT MIN(v) AS t1 FROM cum WHERE cum >= ceil(total * 1 / 3.0)),
t2 AS (SELECT MIN(v) AS t2 FROM cum WHERE cum >= ceil(total * 2 / 3.0))
SELECT doc_id, mean_surprisal_q4,
       CASE WHEN mean_surprisal_q4 <= t1 THEN 'head'
            WHEN mean_surprisal_q4 <= t2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM ppl CROSS JOIN t1 CROSS JOIN t2
"""


# ---------------------------------------------------------------------------
# Per-document tf-idf keywords: the top-K terms per document by
# tf * idf — the keyword/topic-signal extraction pass (search indexing,
# cluster labeling, topic audits over a pretraining corpus). Exact int64
# fixed-point idf (the same 1/16-bit log2 as the LM surprisal) so Spark and
# DuckDB agree bit-exactly.
#
# Scale shape: one explode folded immediately to per-(doc, distinct-token)
# tf rows, one token census groupBy, then a shuffle join keyed on the token
# — the census is UNBOUNDED (distinct tokens across 100 TB), so no
# broadcast hint; stopword-key skew is AQE skew-join territory and the join
# input is already tf-reduced (|distinct tokens per doc|, not token
# occurrences). Top-K per doc is rank<=K over row_number(PARTITION BY
# doc_id) — planned through WindowGroupLimit, so the per-doc top-K folds
# map-side before the doc_id exchange (the domain_cap precedent).

TFIDF_TOPK = 3


def tfidf_topk(documents: DataFrame, topk: int = TFIDF_TOPK) -> DataFrame:
    """(doc_id, token, tf, tfidf_q4) — the top-`topk` tokens per doc by
    tf * idf16, ties to token asc. idf16 = 1/16-bit log2(N_docs *
    LM_PRESCALE / doc_freq) minus the prescale bias: always >= 0, 0 for a
    token present in every doc."""
    from pyspark.sql import Window

    tok = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds BOTH the df census and the scoring join — corpus-REDUCED
    # (distinct (doc, token) rows), the cheap side of the checkpoint rule.
    tf = tf.localCheckpoint(eager=False)
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = documents.agg(
        F.countDistinct(F.col("doc_id").cast("string")).alias("_n_docs")
    )
    scored = (
        tf.join(df_, "token")  # shuffle join: the census is unbounded
        .crossJoin(n_docs)  # 1-row frame; AQE broadcasts at runtime
        .withColumn(
            "_idf_q",
            F.expr(f"(_n_docs * {LM_PRESCALE}) div doc_freq").cast("long"),
        )
        .withColumn(
            "tfidf_q4", (F.col("tf") * _s16_of("_idf_q")).cast("long")
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.desc("tfidf_q4"), F.asc("token")
        )
    )
    return (
        scored.withColumn("_rk", rank)
        .filter(F.col("_rk") <= topk)
        .select("doc_id", "token", F.col("tf").cast("long").alias("tf"), "tfidf_q4")
    )


def sql_tfidf_topk(table: str = "documents", topk: int = TFIDF_TOPK) -> str:
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    s16 = (
        "(16 * (length(bin(_idf_q)) - 1)"
        f" + ((_idf_q * 16) >> (length(bin(_idf_q)) - 1)) - {bias})"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(lower(text), ' ')) AS token
    FROM {table}
  ) WHERE token <> ''
),
tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, COUNT(*)::BIGINT AS doc_freq FROM tf GROUP BY token),
nd AS (SELECT COUNT(DISTINCT CAST(doc_id AS VARCHAR))::BIGINT AS n_docs FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         ((nd.n_docs * {LM_PRESCALE}) // df.doc_freq)::BIGINT AS _idf_q
  FROM tf JOIN df USING (token) CROSS JOIN nd
)
SELECT doc_id, token, tf, (tf * {s16})::BIGINT AS tfidf_q4
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf * {s16} DESC, token ASC) <= {topk}
"""


# ---------------------------------------------------------------------------
# hashed linear quality classifier (fasttext-style serving pass)
# ---------------------------------------------------------------------------
# The model-based quality filter of the DCLM / FineWeb-Edu / GPT-3 pipelines:
# a linear classifier over hashed token buckets, applied corpus-wide. The
# sandbox has no labels to train real weights, so the weight LUT is a
# DETERMINISTIC PLACEHOLDER computed in closed form from the bucket id
# (documented, like the multimodal pixel-decode stub); everything else —
# token hashing, bucket weights, per-doc logit, threshold gate — is the real
# serving plumbing a trained weight vector would drop into.

QC_BUCKETS = 64
QC_WEIGHT_MULT = 2654435761  # Knuth multiplicative hash constant
QC_WEIGHT_MOD = 1001         # weights span [-500, 500]
QC_THRESHOLD_MILLI = 150_000  # mid-range of the placeholder-LUT score distribution


def _qc_bucket(tok):
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("qc|"), tok)), 1, 8), 16, 10)
        .cast("long")
        % QC_BUCKETS
    )


def quality_classifier(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, logit_milli, keep_doc) — hashed-bucket linear
    score: every token hashes to one of QC_BUCKETS buckets, each bucket
    carries an int weight w(b) = (b * KNUTH) % 1001 - 500, and the doc's
    logit is the token-count-weighted mean in milli units (integer div, so
    the DuckDB mirror is bit-exact).

    100 TB shape: ONE narrow Project — pure Column, zero shuffle, zero
    Python; the real-model swap-in replaces w(b) with a literal weight
    array lookup (element_at on a 2^20-entry literal), same plan."""
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    half = (QC_WEIGHT_MOD - 1) // 2
    weights = F.transform(
        toks,
        lambda t: (_qc_bucket(t) * F.lit(QC_WEIGHT_MULT)) % QC_WEIGHT_MOD
        - F.lit(half),
    )
    total = F.aggregate(weights, F.lit(0).cast("long"), lambda a, x: a + x)
    base = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        total.alias("w_total"),
    )
    out = base.select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0, F.expr("(1000 * w_total) div n_tokens")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("logit_milli"),
    )
    return out.select(
        "*", (F.col("logit_milli") >= QC_THRESHOLD_MILLI).alias("keep_doc")
    )


def sql_quality_classifier(table: str = "documents") -> str:
    half = (QC_WEIGHT_MOD - 1) // 2
    bucket = "(('0x' || substr(md5('qc|' || t), 1, 8))::BIGINT % 64)"
    w = f"(({bucket} * {QC_WEIGHT_MULT}) % {QC_WEIGHT_MOD} - {half})"
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM {table}
),
s AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         COALESCE(list_sum(list_transform(ts, t -> {w})), 0) AS w_total
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN n_tokens > 0 THEN (1000 * w_total) // n_tokens
            ELSE 0 END AS BIGINT) AS logit_milli,
       (CASE WHEN n_tokens > 0 THEN (1000 * w_total) // n_tokens
        ELSE 0 END) >= {QC_THRESHOLD_MILLI} AS keep_doc
FROM s
"""


# ---------------------------------------------------------------------------
# quality-weighted sampling (soft model filter, FineWeb/DCLM resample shape)
# ---------------------------------------------------------------------------
# The soft variant of the classifier gate: instead of a hard threshold, each
# document is kept with probability proportional to its classifier score —
# the "sample by quality weight" step DCLM and FineWeb-Edu run after scoring.
# Randomness is a deterministic md5 fraction (same reproducibility contract
# as corpus_sample_hash): rerunning the job keeps exactly the same docs.

QWS_MICRO = 1_000_000  # probability resolution (micro units)


def quality_weighted_sample(documents: DataFrame) -> DataFrame:
    """(doc_id, logit_milli, p_micro, h_micro, keep_doc) — keep probability
    is the classifier logit squashed linearly into [0, 1e6] micro units
    (logit_milli spans [-5e5, 5e5] under the placeholder LUT, so
    p = clamp(5e5 + logit, 0, 1e6)); the coin is the first 12 md5 hex
    digits of 'qws|doc_id' mod 1e6.

    100 TB shape: ONE narrow Project on top of the classifier Project —
    zero shuffle, zero Python, reproducible (nested subsets under a p
    rescale are NOT guaranteed here, unlike corpus_sample_hash, because p
    varies per doc; reruns ARE bit-stable)."""
    scored = quality_classifier(documents)
    p = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(QWS_MICRO).cast("long"), F.lit(QWS_MICRO // 2) + F.col("logit_milli")),
    )
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("qws|"), F.col("doc_id"))), 1, 12), 16, 10)
        .cast("long")
        % QWS_MICRO
    )
    return scored.select(
        "doc_id",
        "logit_milli",
        p.alias("p_micro"),
        h.alias("h_micro"),
        (h < p).alias("keep_doc"),
    )


def sql_quality_weighted_sample(table: str = "documents") -> str:
    p = (
        f"greatest(0, least({QWS_MICRO}, {QWS_MICRO // 2} + logit_milli))"
    )
    h = (
        f"(('0x' || substr(md5('qws|' || doc_id), 1, 12))::BIGINT % {QWS_MICRO})"
    )
    return f"""
WITH scored AS (SELECT doc_id, logit_milli FROM ({sql_quality_classifier(table)}))
SELECT doc_id, logit_milli,
       CAST({p} AS BIGINT) AS p_micro,
       CAST({h} AS BIGINT) AS h_micro,
       {h} < {p} AS keep_doc
FROM scored
"""


# ---------------------------------------------------------------------------
# tokenizer fertility by language (corpus tokenization-efficiency report)
# ---------------------------------------------------------------------------
# The per-language fertility table every multilingual-tokenizer paper prints:
# tokens-per-word and chars-per-token by language, aggregated corpus-wide.
# Languages come from the lexicon language-ID pass (the production swap-in is
# a real langid model feeding the same groupBy).


def lang_fertility(documents: DataFrame) -> DataFrame:
    """(pred_lang, n_docs, n_words, n_tokens, n_chars, fertility_milli,
    chars_per_token_milli) — per-doc language + counts in ONE narrow
    Project, then ONE 4-row aggregation. fertility = BPE-ish tokens per
    whitespace word, in milli units (integer div, corpus-level ratio —
    i.e. token-weighted, not doc-averaged).

    100 TB shape: one shuffle onto a 4-key space with map-side partial
    aggregation (the reduce side moves |langs| rows per task, not docs)."""
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    # language expression re-derived inline: the language and the counts
    # must come from ONE scan — joining language_id(documents) back on
    # doc_id would shuffle the corpus twice for nothing
    lang_words = F.split(F.lower(F.col("text")), " ")

    def hit_count(lex):
        return F.size(F.filter(lang_words, lambda w: w.isin(*lex)))

    scores = {lang: hit_count(lex) for lang, lex in LEXICONS.items()}
    pred = None
    best = None
    for lang in reversed(LANG_ORDER):
        if pred is None:
            pred, best = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] >= best
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
            best = F.when(cond, scores[lang]).otherwise(best)
    one = documents.select(
        pred.alias("pred_lang"),
        F.size(words).cast("long").alias("n_w"),
        F.size(toks).cast("long").alias("n_t"),
        F.length("text").cast("long").alias("n_c"),
    )
    agg = one.groupBy("pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_w").alias("n_words"),
        F.sum("n_t").alias("n_tokens"),
        F.sum("n_c").alias("n_chars"),
    )
    return agg.select(
        "pred_lang", "n_docs", "n_words", "n_tokens", "n_chars",
        F.when(F.col("n_words") > 0, F.expr("(1000 * n_tokens) div n_words"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fertility_milli"),
        F.when(F.col("n_tokens") > 0, F.expr("(1000 * n_chars) div n_tokens"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("chars_per_token_milli"),
    )


def sql_lang_fertility(table: str = "documents") -> str:
    return f"""
WITH lid AS ({sql_language_id(table)}),
cnt AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_w,
         CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_t,
         CAST(length(text) AS BIGINT) AS n_c
  FROM {table}
),
agg AS (
  SELECT pred_lang, COUNT(*)::BIGINT AS n_docs, SUM(n_w)::BIGINT AS n_words,
         SUM(n_t)::BIGINT AS n_tokens, SUM(n_c)::BIGINT AS n_chars
  FROM lid JOIN cnt USING (doc_id)
  GROUP BY pred_lang
)
SELECT pred_lang, n_docs, n_words, n_tokens, n_chars,
       CAST(CASE WHEN n_words > 0 THEN (1000 * n_tokens) // n_words ELSE 0 END AS BIGINT)
         AS fertility_milli,
       CAST(CASE WHEN n_tokens > 0 THEN (1000 * n_chars) // n_tokens ELSE 0 END AS BIGINT)
         AS chars_per_token_milli
FROM agg
"""


def synthesize_multilingual(documents: DataFrame) -> DataFrame:
    """(doc_id, text) — a deterministic 4-language corpus: doc_id%4==0 docs
    keep their original (English-lexicon-heavy) text; the rest are rewritten
    as their language's lexicon cycled to roughly the original length, so
    the language-ID argmax and the per-language length mix are both real.
    Same arithmetic schedule in the DuckDB mirror."""
    did = F.col("doc_id").cast("long")
    text = None
    for k, lang in enumerate(LANG_ORDER):
        if k == 0:
            continue
        phrase = " ".join(LEXICONS[lang]) + " "
        reps = F.greatest(
            F.lit(1), F.expr(f"length(text) div {len(phrase)}").cast("int")
        )
        rewritten = F.repeat(F.lit(phrase), reps)
        cond = did % 4 == k
        text = F.when(cond, rewritten) if text is None else text.when(cond, rewritten)
    text = text.otherwise(F.col("text"))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), text.alias("text")
    )


def sql_synthesize_multilingual(table: str = "documents") -> str:
    cases = []
    for k, lang in enumerate(LANG_ORDER):
        if k == 0:
            continue
        phrase = " ".join(LEXICONS[lang]) + " "
        cases.append(
            f"WHEN CAST(doc_id AS BIGINT) % 4 = {k} THEN "
            f"repeat('{phrase}', greatest(1, length(text) // {len(phrase)}))"
        )
    case = "CASE " + " ".join(cases) + " ELSE text END"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, {case} AS text
FROM {table}
"""


# ---------------------------------------------------------------------------
# winnowing fingerprint selection (Schleimer et al. 2003, the MOSS kernel)
# ---------------------------------------------------------------------------
# The local-min fingerprint selection every plagiarism/overlap detector
# uses: k-gram rolling hashes, then from every window of w consecutive
# hashes select the minimum (rightmost on ties). Guarantee: any shared
# substring of >= w+k-1 tokens shares a selected fingerprint, at ~2/(w+1)
# selection density — the fixed-recall way to shrink an n-gram index
# before a cross-doc census.

WINNOW_K = 3  # k-gram size
WINNOW_W = 4  # winnowing window (consecutive hashes)


def _fanout_docs(documents: DataFrame) -> DataFrame:
    """Auto fan-out for the expensive in-row winnowing stage: a small corpus
    arrives as one file = one partition, serializing the O(n*w) per-doc work
    onto one core. At real scale the scan already has >= cores splits and
    this is a no-op (same self-disabling rule as operators/extract.py)."""
    target = documents.sparkSession.sparkContext.defaultParallelism
    from ..scanutil import estimate_scan_splits

    if estimate_scan_splits(documents) < target:
        return documents.repartition(target)
    return documents


def winnowing_fingerprints(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, pos, fp) — the selected fingerprint set per document (pos =
    0-based k-gram position; short docs with < w hashes winnow their whole
    hash sequence as one window).

    100 TB shape: zero data-dependent shuffle — hashes, window minima, rightmost-tie
    positions and the in-row distinct are all Column algebra over
    materialized array columns (O(n*w) slice work per doc, the same
    bounded-window trick as exact_substr_removal), and the explode is
    narrow (the self-disabling _fanout_docs balance keeps the per-doc work
    parallel when a small corpus scans as one split). The cross-doc census over the selected set is the md5-keyed
    one-groupBy shape shared with duplicate_window_stats — at ~2/(w+1)
    density it moves (w+1)/2 x fewer rows than a full n-gram index."""
    documents = _fanout_docs(documents)
    # pre-filter on the cheap token count (equivalent to the former
    # size(g) > 0 filter: g is non-empty iff n_tokens >= k). Filtering on g
    # itself is the second plan trap: predicate pushdown substitutes the
    # whole gram pipeline into the scan Filter, where interpreted HOF
    # evaluation re-computes the hash array once PER LAMBDA ELEMENT —
    # O(n^2) md5 calls per row (measured ~10x at sf0.1).
    documents = documents.filter(F.size(F.split(F.col("text"), " ")) >= k)
    words = F.split(F.col("text"), " ")
    t = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(
            words,
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
            % P31,
        ).alias("hs"),
    )
    n = F.size(F.col("hs"))
    # sequence(1, 0) DESCENDS in Spark — guard short docs to an empty array
    # (same trap as repetition_stats)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.aggregate(
                F.slice(F.col("hs"), i, k),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * HORNER_BASE + h) % P31,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = t.select("doc_id", grams.alias("g"))
    m = F.greatest(F.lit(1), F.size(F.col("g")) - (w - 1))
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.struct(
                (
                    j - 1 + F.size(F.slice(F.col("g"), j, w))
                    - F.array_position(
                        F.reverse(F.slice(F.col("g"), j, w)),
                        F.array_min(F.slice(F.col("g"), j, w)),
                    )
                ).cast("int").alias("pos"),
                F.array_min(F.slice(F.col("g"), j, w)).alias("fp"),
            ),
        )
    )
    out = g.select("doc_id", F.explode(sel).alias("s"))
    return out.select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))


def sql_winnowing_fingerprints(
    table: str = "documents", k: int = WINNOW_K, w: int = WINNOW_W
) -> str:
    hs = (
        "list_transform(string_split(text, ' '), "
        f"x -> ((('0x' || substr(md5(x),1,15))::BIGINT) % {P31}))"
    )
    gram = (
        f"list_reduce(list_concat([0::BIGINT], list_slice(hs, i, i + {k - 1})), "
        f"(acc, h) -> (acc * {HORNER_BASE} + h) % {P31})"
    )
    win = f"list_slice(g, j, j + {w - 1})"
    return f"""
WITH h AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {hs} AS hs FROM {table}
),
gr AS (
  SELECT doc_id,
         list_transform(range(1, greatest(1, len(hs) - {k - 1}) + 1), i -> {gram}) AS g
  FROM h WHERE len(hs) >= {k}
),
sel AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(1, len(g) - {w - 1}) + 1),
           j -> struct_pack(
             pos := j - 1 + len({win})
                    - list_position(list_reverse({win}), list_min({win})),
             fp := list_min({win})
           )
         )) AS s
  FROM gr
)
SELECT DISTINCT doc_id, CAST(s.pos AS INT) AS pos, CAST(s.fp AS BIGINT) AS fp
FROM sel
"""


WINNOW_DF_CAP = 50  # drop fingerprints shared by more docs (boilerplate)
WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many fingerprints


def winnowing_overlap(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    df_cap: int = WINNOW_DF_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """(doc_a, doc_b, n_shared, pm_a, pm_b) — the MOSS overlap report: for
    every document pair sharing >= min_shared selected fingerprints, the
    shared count and the per-mille of each side's fingerprint set it covers
    (winnowing guarantee: any common run of >= w+k-1 tokens contributes a
    shared fingerprint, so pm_* lower-bounds copied-passage coverage).

    100 TB shape: the candidate generator is the df-capped inverted-index
    kernel of ngram_jaccard_pairs, but over the winnowed selection —
    ~2/(w+1) of the gram volume for the same >=w+k-1-token recall. The
    per-doc fingerprint SET is built in-row (array_distinct of the window
    minima — no (doc_id, fp) distinct shuffle); the hot-fingerprint cut is a
    shuffle anti-join with NO broadcast hint (the above-cap list grows with
    the corpus); posting lists are <= df_cap docs so in-list pairs
    (<= C(df_cap, 2) per fingerprint) are generated JVM-side. Each side's
    set size rides on the inverted-index rows into the posting-list structs,
    so the pair report needs NO join back to a sizes relation.

    Plan traps (measured 20x combined, round 4): (1) the explode's child
    must not be a bare projected attribute — explode(attribute) makes
    InferFiltersFromGenerate emit size(attr)>0, and predicate pushdown then
    substitutes the whole nested fps/grams/hashes tree into a scan-level
    interpreted Filter, re-expanding the gram pipeline once per window; the
    child here is a cheap struct-wrapper expression over the attribute, so
    the rule skips it while fps itself is still computed once. (2) no
    filter may mention g or fps — interpreted HOF evaluation inside a
    pushed filter recomputes inner arrays once per lambda element; the row
    gate is the cheap n_tokens >= k pre-filter instead."""
    documents = _fanout_docs(documents)
    # pre-filter on the cheap token count (equivalent to the former
    # size(g) > 0 filter: g is non-empty iff n_tokens >= k). Filtering on g
    # itself is the second plan trap: predicate pushdown substitutes the
    # whole gram pipeline into the scan Filter, where interpreted HOF
    # evaluation re-computes the hash array once PER LAMBDA ELEMENT —
    # O(n^2) md5 calls per row (measured ~10x at sf0.1).
    documents = documents.filter(F.size(F.split(F.col("text"), " ")) >= k)
    words = F.split(F.col("text"), " ")
    t = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(
            words,
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
            % P31,
        ).alias("hs"),
    )
    n = F.size(F.col("hs"))
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.aggregate(
                F.slice(F.col("hs"), i, k),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * HORNER_BASE + h) % P31,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = t.select("doc_id", grams.alias("g"))
    m = F.greatest(F.lit(1), F.size(F.col("g")) - (w - 1))
    # the selected SET is the distinct window minima — pos dropped, so the
    # per-doc distinct happens in-row instead of as a (doc_id, fp) shuffle
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.array_min(F.slice(F.col("g"), j, w)),
        )
    )
    # explode a cheap struct-wrapper EXPRESSION over the materialized fps
    # attribute (see plan trap above; the wrapper references only the
    # attribute, so fps is computed once and no filter is inferred); n_fp
    # rides along so no sizes relation needs joining back later
    pd_ = g.select("doc_id", fps.alias("fps"))
    fa = F.col("fps")
    inv = pd_.select(
        "doc_id",
        F.explode(
            F.transform(
                fa, lambda x: F.struct(x.alias("fp"), F.size(fa).alias("n_fp"))
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.fp").alias("fp"), F.col("s.n_fp").alias("n_fp"))
    # two consumers (hot census + anti-join probe): materialize once
    inv = inv.localCheckpoint(eager=False)
    hot = (
        inv.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("fp")
    )
    inv = inv.join(hot, "fp", "left_anti")
    per_fp = (
        inv.groupBy("fp")
        .agg(
            F.array_sort(F.collect_list(F.struct("doc_id", "n_fp"))).alias("ds")
        )
        .filter(F.size("ds") >= 2)
    )
    ds = F.col("ds")
    pairs_col = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + 2, F.size(ds)),
                lambda b: F.struct(
                    a["doc_id"].alias("doc_a"),
                    b["doc_id"].alias("doc_b"),
                    a["n_fp"].alias("n_fp_a"),
                    b["n_fp"].alias("n_fp_b"),
                ),
            ),
        )
    )
    shared = (
        per_fp.select(F.explode(pairs_col).alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("p.n_fp_a").alias("n_fp_a"),
            F.col("p.n_fp_b").alias("n_fp_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.select(
        "doc_a",
        "doc_b",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.expr("(1000 * n_shared) div n_fp_a").cast("int").alias("pm_a"),
        F.expr("(1000 * n_shared) div n_fp_b").cast("int").alias("pm_b"),
    )


def sql_winnowing_overlap(
    table: str = "documents",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    df_cap: int = WINNOW_DF_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> str:
    # mirrors the OUTPUT relation (per-doc distinct fingerprint sets -> df
    # cut -> pair census), not the Spark plan
    sel = sql_winnowing_fingerprints(table, k, w)
    return f"""
WITH sel AS ({sel}),
pd AS (SELECT DISTINCT doc_id, fp FROM sel),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM pd GROUP BY doc_id),
cen AS (SELECT fp FROM pd GROUP BY fp HAVING COUNT(*) <= {df_cap}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM pd a JOIN cen USING (fp) JOIN pd b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_shared}
)
SELECT doc_a, doc_b, n_shared,
       CAST((1000 * n_shared) // sa.n_fp AS INT) AS pm_a,
       CAST((1000 * n_shared) // sb.n_fp AS INT) AS pm_b
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


# ---------------------------------------------------------------------------
# readability scoring (Flesch reading ease, integer fixed-point)
# ---------------------------------------------------------------------------
# A classic cheap document-quality signal next to the Gopher gates: Flesch
# reading ease 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words),
# with syllables approximated by vowel-group count (the standard
# no-dictionary heuristic). Computed in integer milli-units with integer
# division so the Spark and DuckDB results are bit-identical — the same
# fixed-point discipline as unigram_perplexity.

READ_EASY_MILLI = 60_000    # >= 60.0 -> 'easy' (plain English)
READ_MEDIUM_MILLI = 30_000  # >= 30.0 -> 'medium', below -> 'hard'


def readability_counts(text: Column) -> Tuple[Column, Column, Column]:
    """(n_words, n_sentences, n_syllables) Columns for a text Column — the
    shared kernel for the readability query and the hygiene-job gate."""
    words = F.greatest(F.lit(1), F.size(F.split(text, " ")))
    # sentences = terminal-punctuation count, floored at 1
    sentences = F.greatest(
        F.lit(1),
        F.length(text) - F.length(F.regexp_replace(text, r"[.!?]", "")),
    )
    # syllable proxy: vowel-group count, floored at 1
    syllables = F.greatest(
        F.lit(1),
        F.size(F.split(F.lower(text), "[aeiou]+")) - 1,
    )
    return words, sentences, syllables


def flesch_milli(words: Column, sentences: Column, syllables: Column) -> Column:
    """Integer fixed-point Flesch reading ease in milli-units:
    206835 - (1015*words div sentences) - (84600*syllables div words).

    The ONE shared definition for the text_readability query and the
    hygiene-job read-floor gate (jobs/hygiene_job.py), so the two cannot
    drift. Integer division is expressed Column-natively as (a - a%b)/b —
    exact for the non-negative count domain and identical to SQL `div`."""

    def idiv(a: Column, b: Column) -> Column:
        return ((a - a % b) / b).cast("long")

    w = words.cast("long")
    s = sentences.cast("long")
    y = syllables.cast("long")
    return (
        F.lit(206_835) - idiv(F.lit(1015) * w, s) - idiv(F.lit(84_600) * y, w)
    ).cast("long")


def readability(documents: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch_milli, band) —
    integer fixed-point Flesch reading ease per document.

    100 TB shape: ONE narrow Project, zero shuffle, zero Python — counts
    come from split/regexp Column algebra, the score from integer div.
    """
    words, sentences, syllables = readability_counts(F.col("text"))
    out = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
    ).select(
        "*",
        flesch_milli(
            F.col("n_words"), F.col("n_sentences"), F.col("n_syllables")
        ).alias("flesch_milli"),
    )
    return out.select(
        "*",
        F.when(F.col("flesch_milli") >= READ_EASY_MILLI, "easy")
        .when(F.col("flesch_milli") >= READ_MEDIUM_MILLI, "medium")
        .otherwise("hard")
        .alias("band"),
    )


def sql_readability(table: str = "documents") -> str:
    """DuckDB mirror with the same integer fixed-point formula."""
    return f"""
WITH c AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         GREATEST(1, len(string_split(text, ' '))) AS n_words,
         GREATEST(1, len(text) - len(regexp_replace(text, '[.!?]', '', 'g')))
           AS n_sentences,
         GREATEST(1, len(string_split_regex(lower(text), '[aeiou]+')) - 1)
           AS n_syllables
  FROM {table}
),
s AS (
  SELECT doc_id,
         CAST(n_words AS BIGINT) AS n_words,
         CAST(n_sentences AS BIGINT) AS n_sentences,
         CAST(n_syllables AS BIGINT) AS n_syllables,
         CAST(206835 - (1015 * n_words) // n_sentences
                     - (84600 * n_syllables) // n_words AS BIGINT)
           AS flesch_milli
  FROM c
)
SELECT *,
       CASE WHEN flesch_milli >= {READ_EASY_MILLI} THEN 'easy'
            WHEN flesch_milli >= {READ_MEDIUM_MILLI} THEN 'medium'
            ELSE 'hard' END AS band
FROM s
"""


# ---------------------------------------------------------------------------
# Script/charset detection (the writing-SYSTEM axis of language ID — what
# fastText's langid keys on first; CCNet and mC4 both bucket crawl docs by
# script before the lexicon stage, because a Cyrillic page can't match an
# English lexicon no matter its quality). Pure per-char class counting via
# length deltas — zero shuffle, zero Python; every step is codepoint
# counting, which Spark's length() and DuckDB's length() agree on.
#
# The fixture corpus is all-ASCII, so the synthesizer plants the structure
# the operator exists for: an md5 schedule rewrites ~1/5 of docs as
# Cyrillic, ~1/5 as CJK, and mixes a Cyrillic quote into ~1/5 — the same
# pattern as synthesize_encoding/synthesize_dsir.

SCRIPT_CYR_PHRASE = "привет мир данные поток система модель"
SCRIPT_CJK_PHRASE = "数据 处理 系统 模型 语言 训练"
SCRIPT_MIX_QUOTE = "цитата из статьи"


def synthesize_scripts(documents: DataFrame) -> DataFrame:
    """(doc_id, text2) — deterministic multilingual rewrite: md5 bucket 0
    replaces the doc with repeated Cyrillic, 1 with repeated CJK, 2 appends
    a short Cyrillic quote to the Latin text, else the text is unchanged."""
    did = F.col("doc_id").cast("string")
    b = F.conv(F.substring(F.md5(F.concat(F.lit("scr|"), did)), 1, 4), 16, 10) % 5
    text2 = (
        F.when(b == 0, F.repeat(F.lit(SCRIPT_CYR_PHRASE + " "), 3))
        .when(b == 1, F.repeat(F.lit(SCRIPT_CJK_PHRASE + " "), 3))
        .when(b == 2, F.concat(F.col("text"), F.lit(" " + SCRIPT_MIX_QUOTE)))
        .otherwise(F.col("text"))
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), text2.alias("text2")
    )


def script_ratios(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, latin_pm, digit_pm, cyrillic_pm, cjk_pm, other_pm,
    script) over (doc_id, text2): per-mille of non-whitespace codepoints in
    each class; `script` is the argmax class with a fixed priority order on
    ties (latin, digit, cyrillic, cjk, other)."""
    stripped = docs.select(
        "doc_id", F.regexp_replace("text2", r"\s", "").alias("_s")
    )

    def n_cls(pat: str):
        return F.length("_s") - F.length(F.regexp_replace("_s", pat, ""))

    counted = stripped.select(
        "doc_id",
        F.length("_s").cast("long").alias("n_chars"),
        n_cls("[a-zA-Z]").cast("long").alias("_lat"),
        n_cls("[0-9]").cast("long").alias("_dig"),
        n_cls("[Ѐ-ӿ]").cast("long").alias("_cyr"),
        n_cls("[一-鿿]").cast("long").alias("_cjk"),
    ).withColumn(
        "_oth",
        (F.col("n_chars") - F.col("_lat") - F.col("_dig") - F.col("_cyr") - F.col("_cjk")).cast("long"),
    )
    pm = lambda c: F.expr(f"CASE WHEN n_chars > 0 THEN (1000 * {c}) div n_chars ELSE 0 END").cast("int")  # noqa: E731
    script = (
        F.when(
            (F.col("_lat") >= F.col("_dig")) & (F.col("_lat") >= F.col("_cyr"))
            & (F.col("_lat") >= F.col("_cjk")) & (F.col("_lat") >= F.col("_oth")),
            "latin",
        )
        .when(
            (F.col("_dig") >= F.col("_cyr")) & (F.col("_dig") >= F.col("_cjk"))
            & (F.col("_dig") >= F.col("_oth")),
            "digit",
        )
        .when((F.col("_cyr") >= F.col("_cjk")) & (F.col("_cyr") >= F.col("_oth")), "cyrillic")
        .when(F.col("_cjk") >= F.col("_oth"), "cjk")
        .otherwise("other")
    )
    return counted.select(
        "doc_id",
        "n_chars",
        pm("_lat").alias("latin_pm"),
        pm("_dig").alias("digit_pm"),
        pm("_cyr").alias("cyrillic_pm"),
        pm("_cjk").alias("cjk_pm"),
        pm("_oth").alias("other_pm"),
        script.alias("script"),
    )


def sql_script_ratios(table: str = "documents") -> str:
    """DuckDB mirror: identical synthesis schedule, length-delta class
    counts (regexp_replace with the 'g' flag), same argmax priority."""
    did = "CAST(doc_id AS VARCHAR)"
    b = f"(('0x' || substr(md5('scr|' || {did}), 1, 4))::BIGINT % 5)"
    text2 = (
        f"CASE {b} WHEN 0 THEN repeat('{SCRIPT_CYR_PHRASE} ', 3) "
        f"WHEN 1 THEN repeat('{SCRIPT_CJK_PHRASE} ', 3) "
        f"WHEN 2 THEN text || ' {SCRIPT_MIX_QUOTE}' ELSE text END"
    )

    def n_cls(pat: str) -> str:
        return f"(length(s) - length(regexp_replace(s, '{pat}', '', 'g')))::BIGINT"

    pm = "CASE WHEN n_chars > 0 THEN (1000 * {c}) // n_chars ELSE 0 END"
    return f"""
WITH d AS (
  SELECT {did} AS doc_id, {text2} AS text2 FROM {table}
),
st AS (
  SELECT doc_id, regexp_replace(text2, '\\s', '', 'g') AS s FROM d
),
c AS (
  SELECT doc_id, length(s)::BIGINT AS n_chars,
         {n_cls('[a-zA-Z]')} AS lat,
         {n_cls('[0-9]')} AS dig,
         {n_cls('[Ѐ-ӿ]')} AS cyr,
         {n_cls('[一-鿿]')} AS cjk
  FROM st
),
c2 AS (
  SELECT doc_id, n_chars, lat, dig, cyr, cjk,
         (n_chars - lat - dig - cyr - cjk)::BIGINT AS oth
  FROM c
)
SELECT doc_id, n_chars,
       CAST({pm.format(c='lat')} AS INT) AS latin_pm,
       CAST({pm.format(c='dig')} AS INT) AS digit_pm,
       CAST({pm.format(c='cyr')} AS INT) AS cyrillic_pm,
       CAST({pm.format(c='cjk')} AS INT) AS cjk_pm,
       CAST({pm.format(c='oth')} AS INT) AS other_pm,
       CASE WHEN lat >= dig AND lat >= cyr AND lat >= cjk AND lat >= oth THEN 'latin'
            WHEN dig >= cyr AND dig >= cjk AND dig >= oth THEN 'digit'
            WHEN cyr >= cjk AND cyr >= oth THEN 'cyrillic'
            WHEN cjk >= oth THEN 'cjk'
            ELSE 'other' END AS script
FROM c2
"""


# ---------------------------------------------------------------------------
# Character-entropy gate (the gibberish/low-diversity detector of
# Dolma/RedPajama-style quality stacks: binary-ish and base64-ish payloads
# score HIGH, template/repeated-char junk scores LOW; both tails are
# gated). Shannon entropy over the document's own character distribution,
# computed ENTIRELY in-row: the char census is an O(n * alphabet)
# transform/filter fold over a MATERIALIZED char array (the no-CSE rule),
# the log2 is the same 1/16-bit int64 fixed point as the LM surprisal —
# zero shuffle, zero Python, Spark == DuckDB bit-exact.
#
# H_q4 = (sum over distinct chars c of k_c * s16((N * PRESCALE) div k_c))
#        div N   — per-char surprisal weighted by its count, in 1/16 bits.

ENTROPY_LOW_GATE_Q4 = 56    # < 3.5 bits/char: repeated/template junk
ENTROPY_HIGH_GATE_Q4 = 69   # > ~4.3 bits/char: random-ish payloads
#   gates bracket natural lowercase English (~4.1 bits/char with spaces
#   removed); both tails fire on the fixture via the planted schedule


def synthesize_entropy(documents: DataFrame) -> DataFrame:
    """(doc_id, text2) — md5 schedule plants both entropy tails: bucket 0
    replaces the doc with a single repeated character run (low tail),
    bucket 1 with a base64-ish random stream (high tail: three md5 streams
    translated onto disjoint 16-symbol alphabets -> 48 near-uniform symbols,
    ~5.6 bits/char), else unchanged."""
    did = F.col("doc_id").cast("string")
    b = F.conv(F.substring(F.md5(F.concat(F.lit("ent|"), did)), 1, 4), 16, 10) % 6
    hexstream = F.concat_ws(
        "",
        F.md5(F.concat(F.lit("e0|"), did)),
        F.translate(
            F.md5(F.concat(F.lit("e1|"), did)),
            "0123456789abcdef", "ghijklmnopqrstuv",
        ),
        F.translate(
            F.md5(F.concat(F.lit("e2|"), did)),
            "0123456789abcdef", "GHIJKLMNOPQRSTUV",
        ),
    )
    text2 = (
        F.when(b == 0, F.repeat(F.lit("aaaa "), 40))
        .when(b == 1, hexstream)
        .otherwise(F.col("text"))
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), text2.alias("text2")
    )


def entropy_char_array(text_col) -> "F.Column":
    """The census domain: lowercased non-space codepoints as an array.
    Shared by the text_char_entropy query and the hygiene job's entropy
    gate so the two can't drift (the flesch_milli precedent)."""
    return F.filter(
        F.split(F.lower(text_col), ""), lambda c: c != F.lit(" ")
    )


def entropy_q4_expr() -> "F.Column":
    """Entropy fold in 1/16-bit int64 units over the MATERIALIZED `_ch` /
    `_n` attributes (never inline expressions: interpreted HOFs re-evaluate
    inner array expressions per element — the winnowing trap). Callers
    project `_ch` = entropy_char_array(...) and `_n` = size(_ch) first."""
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    return F.expr(
        f"""aggregate(
          transform(array_distinct(_ch),
                    c -> cast(size(filter(_ch, x -> x = c)) as bigint)),
          cast(0 as bigint),
          (acc, k) -> acc + k * (
            16 * (length(bin((_n * {LM_PRESCALE}) div k)) - 1)
            + shiftright(((_n * {LM_PRESCALE}) div k) * 16,
                         length(bin((_n * {LM_PRESCALE}) div k)) - 1)
            - {bias})
        ) div _n"""
    ).cast("long")


def char_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, entropy_q4, entropy_flag) over (doc_id, text2):
    per-char Shannon entropy in 1/16-bit units over non-space codepoints;
    entropy_flag marks BOTH gated tails (too low = repetitive junk, too
    high = random-ish payload)."""
    base = docs.select(
        "doc_id", entropy_char_array(F.col("text2")).alias("_ch")
    ).withColumn("_n", F.size("_ch").cast("long"))
    h = entropy_q4_expr()
    out = base.filter(F.col("_n") > 0).select(
        "doc_id",
        F.col("_n").alias("n_chars"),
        h.alias("entropy_q4"),
    )
    return out.select(
        "doc_id",
        "n_chars",
        "entropy_q4",
        (
            (F.col("entropy_q4") < ENTROPY_LOW_GATE_Q4)
            | (F.col("entropy_q4") > ENTROPY_HIGH_GATE_Q4)
        ).alias("entropy_flag"),
    )


def sql_char_entropy(table: str = "documents") -> str:
    """DuckDB mirror: the naive explode/GROUP BY census shape (fine at
    oracle scale — exactly the shuffle the Spark side avoids), same
    integer log2 and gates."""
    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    did = "CAST(doc_id AS VARCHAR)"
    b = f"(('0x' || substr(md5('ent|' || {did}), 1, 4))::BIGINT % 6)"
    hexstream = (
        f"md5('e0|' || {did})"
        f" || translate(md5('e1|' || {did}), '0123456789abcdef', 'ghijklmnopqrstuv')"
        f" || translate(md5('e2|' || {did}), '0123456789abcdef', 'GHIJKLMNOPQRSTUV')"
    )
    text2 = (
        f"CASE {b} WHEN 0 THEN repeat('aaaa ', 40) "
        f"WHEN 1 THEN {hexstream} ELSE text END"
    )
    s16 = (
        "(16 * (length(bin(q)) - 1)"
        f" + ((q * 16) >> (length(bin(q)) - 1)) - {bias})"
    )
    return f"""
WITH d AS (
  SELECT {did} AS doc_id, {text2} AS text2 FROM {table}
),
ch AS (
  SELECT doc_id, unnest(string_split(lower(text2), '')) AS c FROM d
),
nz AS (SELECT doc_id, c FROM ch WHERE c <> ' '),
cnt AS (SELECT doc_id, c, COUNT(*)::BIGINT AS k FROM nz GROUP BY 1, 2),
tot AS (SELECT doc_id, SUM(k)::BIGINT AS n FROM cnt GROUP BY 1),
s AS (
  SELECT cnt.doc_id, tot.n, cnt.k,
         ((tot.n * {LM_PRESCALE}) // cnt.k)::BIGINT AS q
  FROM cnt JOIN tot USING (doc_id)
),
e AS (
  SELECT doc_id, MAX(n)::BIGINT AS n_chars,
         (SUM(k * {s16})::BIGINT // MAX(n))::BIGINT AS entropy_q4
  FROM s GROUP BY doc_id
)
SELECT doc_id, n_chars, entropy_q4,
       (entropy_q4 < {ENTROPY_LOW_GATE_Q4}
        OR entropy_q4 > {ENTROPY_HIGH_GATE_Q4}) AS entropy_flag
FROM e
"""


# ---------------------------------------------------------------------------
# Quality-gate threshold calibration. Pipelines don't pick gate thresholds
# by feel — they pick a KEEP RATE (e.g. "drop the worst quarter") and
# derive the threshold from the corpus's own score distribution, re-derived
# per snapshot so the gate tracks distribution drift. Same kernel as the
# CCNet terciles: the per-doc score quantizes to a BOUNDED domain (whole
# Flesch points after the 0-clamp: <= ~207 distinct values at ANY corpus
# size), one groupBy over that domain, a descending cumulative sum on the
# few-hundred-row histogram (allowlisted single-partition window over a
# bounded domain), and the threshold is the largest score that still keeps
# at least the target count.

CAL_TARGETS_PM = (250, 500, 750)  # keep rates to calibrate: 25% / 50% / 75%


def quality_calibrate(
    documents: DataFrame, targets_pm: tuple = CAL_TARGETS_PM
) -> DataFrame:
    """(target_pm, threshold_pt, kept_docs, achieved_pm, total_docs) — for
    each target keep rate, the largest whole-Flesch-point threshold whose
    `score >= threshold` gate keeps at least ceil(target * N / 1000) docs,
    with the rate it actually achieves (score ties make achieved >= target
    — the gate is conservative, never silently under-keeps)."""
    from pyspark.sql import Window

    w_, s_, y_ = readability_counts(F.col("text"))
    pt = F.expr(
        "CASE WHEN _f < 0 THEN 0 ELSE _f div 1000 END"
    ).cast("long")
    scored = documents.select(flesch_milli(w_, s_, y_).alias("_f")).select(
        pt.alias("pt")
    )
    hist = scored.groupBy("pt").agg(F.count(F.lit(1)).alias("c"))
    win = Window.orderBy(F.desc("pt")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "pt",
        F.sum("c").over(win).alias("cum_ge"),
        F.sum("c").over(wt).alias("total"),
    )
    targets = documents.sparkSession.createDataFrame(
        [(int(t),) for t in sorted(targets_pm)], "target_pm int"
    )
    need = F.ceil(F.col("total") * F.col("target_pm") / F.lit(1000.0)).cast(
        "long"
    )
    return (
        cum.crossJoin(targets)  # histogram x |targets|: a few hundred rows
        .filter(F.col("cum_ge") >= need)
        .groupBy("target_pm")
        .agg(
            F.max(F.struct(F.col("pt"), F.col("cum_ge"))).alias("_b"),
            F.first("total").alias("total_docs"),
        )
        .select(
            "target_pm",
            F.col("_b.pt").alias("threshold_pt"),
            F.col("_b.cum_ge").alias("kept_docs"),
            F.expr("1000 * _b.cum_ge div total_docs").cast("long").alias(
                "achieved_pm"
            ),
            F.col("total_docs").cast("long").alias("total_docs"),
        )
    )


def sql_quality_calibrate(
    table: str = "documents", targets_pm: tuple = CAL_TARGETS_PM
) -> str:
    tvals = ", ".join(f"({int(t)})" for t in sorted(targets_pm))
    return f"""
WITH scored AS (
  SELECT CASE WHEN f < 0 THEN 0 ELSE f // 1000 END AS pt FROM (
    SELECT 206835
           - (1015 * GREATEST(1, len(string_split(text, ' '))))
             // GREATEST(1, len(text) - len(regexp_replace(text, '[.!?]', '', 'g')))
           - (84600 * GREATEST(1, len(string_split_regex(lower(text), '[aeiou]+')) - 1))
             // GREATEST(1, len(string_split(text, ' '))) AS f
    FROM {table})
),
hist AS (SELECT pt, COUNT(*)::BIGINT AS c FROM scored GROUP BY pt),
cum AS (
  SELECT pt, SUM(c) OVER (ORDER BY pt DESC) AS cum_ge, SUM(c) OVER () AS total
  FROM hist
),
targets(target_pm) AS (VALUES {tvals})
SELECT target_pm,
       MAX(pt)::BIGINT AS threshold_pt,
       MAX_BY(cum_ge, pt)::BIGINT AS kept_docs,
       (1000 * MAX_BY(cum_ge, pt) // ANY_VALUE(total))::BIGINT AS achieved_pm,
       ANY_VALUE(total)::BIGINT AS total_docs
FROM cum CROSS JOIN targets
WHERE cum_ge >= ceil(total * target_pm / 1000.0)
GROUP BY target_pm
"""


# ------------------------------------------------------- snapshot drift
# Crawl-snapshot distribution monitoring: the retraining-trigger question
# "did the token distribution move between snapshot A and snapshot B, and
# where?". Exact per-token comparison is vocabulary-sized; the census here
# is hash-bucketed into DRIFT_BUCKETS cells per language (the DSIR trick),
# so the state is bounded at |langs| x DRIFT_BUCKETS regardless of corpus
# or vocabulary size and the distance is computed over buckets. L1 over
# hashed buckets lower-bounds the true token-distribution L1 (hashing can
# only cancel mass, never create it) — a rising bucket-L1 is a certain
# distribution shift.

DRIFT_BUCKETS = 1024
DRIFT_PPM = 1_000_000  # parts-per-million fixed point for shares


def snapshot_drift(documents: DataFrame) -> DataFrame:
    """(lang, tokens_a, tokens_b, l1_ppm, top_bucket, top_shift_ppm) —
    per-language drift between two md5-split snapshot halves: bucketed
    token shares in ppm, summed absolute share difference, and the single
    most-shifted bucket (max by (|diff|, bucket) struct order).

    100 TB shape: ONE groupBy on (lang, bucket) with both snapshots'
    counts as conditional sums (map-side combine; key space bounded at
    |langs| x DRIFT_BUCKETS), a language-sized totals join, then a
    language-keyed fold. The corpus is scanned once and never regrouped
    on an unbounded key."""
    doc = F.col("doc_id").cast("string")
    snap = (
        F.conv(F.substring(F.md5(F.concat(F.lit("snap|"), doc)), 1, 4), 16, 10)
        .cast("long")
        % 2
    )
    tok = documents.select(
        F.col("lang").cast("string").alias("lang"),
        snap.alias("snap"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("drf|"), F.col("token"))), 1, 8), 16, 10)
        .cast("long")
        % DRIFT_BUCKETS
    )
    census = (
        tok.select("lang", "snap", bucket.alias("b"))
        .groupBy("lang", "b")
        .agg(
            F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).cast("long").alias("cb"),
        )
    )
    totals = census.groupBy("lang").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    shares = census.join(totals, "lang").select(
        "lang",
        "b",
        "na",
        "nb",
        F.expr(
            f"abs(({DRIFT_PPM} * ca) div greatest(na, 1)"
            f" - ({DRIFT_PPM} * cb) div greatest(nb, 1))"
        ).alias("d"),
    )
    return (
        shares.groupBy("lang")
        .agg(
            F.max("na").alias("tokens_a"),
            F.max("nb").alias("tokens_b"),
            F.sum("d").cast("long").alias("l1_ppm"),
            F.max(F.struct(F.col("d"), F.col("b"))).alias("_m"),
        )
        .select(
            "lang",
            "tokens_a",
            "tokens_b",
            "l1_ppm",
            F.col("_m.b").cast("long").alias("top_bucket"),
            F.col("_m.d").cast("long").alias("top_shift_ppm"),
        )
        .orderBy("lang")
    )


def sql_snapshot_drift(table: str = "documents") -> str:
    """DuckDB mirror: identical snapshot coin, bucket hash, conditional
    census, and integer share arithmetic."""
    return f"""
WITH tok AS (
  SELECT CAST(lang AS VARCHAR) AS lang,
         (('0x' || substr(md5('snap|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
          % 2) AS snap,
         token
  FROM (
    SELECT doc_id, lang,
           unnest(string_split(lower(text), ' ')) AS token
    FROM {table}
  ) WHERE token <> ''
),
census AS (
  SELECT lang,
         (('0x' || substr(md5('drf|' || token), 1, 8))::BIGINT % {DRIFT_BUCKETS}) AS b,
         CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM tok GROUP BY 1, 2
),
totals AS (
  SELECT lang, SUM(ca) AS na, SUM(cb) AS nb FROM census GROUP BY lang
),
shares AS (
  SELECT c.lang, c.b, t.na, t.nb,
         abs(({DRIFT_PPM} * c.ca) // GREATEST(t.na, 1)
             - ({DRIFT_PPM} * c.cb) // GREATEST(t.nb, 1)) AS d
  FROM census c JOIN totals t ON c.lang = t.lang
)
SELECT lang,
       CAST(MAX(na) AS BIGINT) AS tokens_a,
       CAST(MAX(nb) AS BIGINT) AS tokens_b,
       CAST(SUM(d) AS BIGINT) AS l1_ppm,
       CAST((MAX(struct_pack(d := d, b := b))).b AS BIGINT) AS top_bucket,
       CAST((MAX(struct_pack(d := d, b := b))).d AS BIGINT) AS top_shift_ppm
FROM shares GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------- novelty score
# Per-document novelty: the fraction of a document's token trigrams that
# appear NOWHERE else in the corpus — the diversity/memorization-risk
# signal (a doc of entirely-shared trigrams is boilerplate; a doc of
# unique ones is fresh text). Exact trigram df is vocabulary-unbounded, so
# trigrams hash into NOV_BUCKETS cells: a trigram is counted novel when
# its bucket's GLOBAL occupancy equals the document's own occurrences
# (nobody else landed there). Collisions can only steal novelty, never
# mint it, so the score is a certified LOWER bound with error ~grams/2^16.

NOV_BUCKETS = 65536


def novelty_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_grams, novel_pm) — per-mille of the doc's trigram
    occurrences whose hash bucket is touched by no other document.

    100 TB shape: one (doc, bucket) groupBy (doc-keyed, the size of any
    per-doc relation), one bounded bucket census (<= NOV_BUCKETS rows,
    map-side combine; AQE broadcasts it into the join), one doc-keyed
    fold. The unbounded trigram vocabulary never becomes a key."""
    doc = F.col("doc_id").cast("string")
    ws = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    # ws materializes in its own Project: the trigram lambda references it
    # three element_at's per element, and inlining would re-embed the
    # split+filter subtree at every reference (the winnowing HOF lesson)
    base = documents.select(doc.alias("doc_id"), ws.alias("ws"))
    wcol = F.col("ws")
    # guard: Spark's sequence(1, n) DESCENDS when n < 1 (it never returns
    # empty), so short docs need an explicit empty-array branch
    tri = F.when(
        F.size(wcol) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(wcol) - 2),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.element_at(wcol, i),
                            F.element_at(wcol, i + 1),
                            F.element_at(wcol, i + 2),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % NOV_BUCKETS,
        ),
    ).otherwise(F.expr("array()").cast("array<long>"))
    grams = base.select("doc_id", F.explode(tri).alias("b"))
    per_doc = grams.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # per_doc (a REDUCED frame) feeds both the join and the census below;
    # checkpoint it once so the md5-heavy gram explosion never runs twice
    # (it previously fed census directly from `grams`, doubling the hash
    # work — found timing the round-5 suite; ~2x on this operator)
    per_doc = per_doc.localCheckpoint(eager=False)
    # bounded census: <= NOV_BUCKETS keys with map-side partials; g = the
    # bucket's global occupancy = the sum of per-doc occupancies
    census = per_doc.groupBy("b").agg(F.sum("c").cast("long").alias("g"))
    scored = per_doc.join(census, "b").select(
        "doc_id",
        "c",
        (F.col("g") == F.col("c")).cast("long").alias("nv"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.expr("cast((1000 * sum(nv * c)) div sum(c) as long)").alias("novel_pm"),
        )
        .orderBy("doc_id")
    )


def sql_novelty_scores(table: str = "documents") -> str:
    """DuckDB mirror: identical trigram hash, per-doc and global censuses,
    and integer per-mille fold."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
  FROM {table}
),
grams AS (
  SELECT doc_id,
         (('0x' || substr(md5(ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]),
                          1, 8))::BIGINT % {NOV_BUCKETS}) AS b
  FROM toks, unnest(range(1, GREATEST(len(ws) - 2, 0) + 1)) AS u(i)
),
per_doc AS (
  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2
),
census AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS g FROM grams GROUP BY 1
)
SELECT p.doc_id,
       CAST(SUM(p.c) AS BIGINT) AS n_grams,
       CAST((1000 * SUM(CASE WHEN c.g = p.c THEN p.c ELSE 0 END)) // SUM(p.c)
            AS BIGINT) AS novel_pm
FROM per_doc p JOIN census c ON p.b = c.b
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


# ---------------------------------------------------- code-switch detection
# Document-level language ID hides mixed-language documents (boilerplate
# in one language wrapping content in another, forum quotes, spam keyword
# stuffing) — the docs multilingual filters most want to catch. This
# operator runs the SAME lexicon argmax as language_id over fixed word
# windows and reports the mix: the majority window language, how many
# windows disagree with it, and how many ADJACENT windows disagree with
# each other (the code-switching rate proper).
#
# 100 TB shape: zero shuffle — windowing, per-window argmax, majority
# vote, and the boundary count are all in-row array algebra (transform /
# filter / zip_with) inside one Project; output is one row per doc.

CS_WIN = 16  # words per language window


def _window_pred(win):
    """Lexicon-hit argmax over one word-array window — language_id's fold,
    factored for the windowed variant (ties resolve in LANG_ORDER)."""
    scores = {
        lang: F.size(F.filter(win, lambda w: w.isin(*lex)))
        for lang, lex in LEXICONS.items()
    }
    pred = None
    best = None
    for lang in reversed(LANG_ORDER):
        if pred is None:
            pred = F.lit(lang)
            best = scores[lang]
        else:
            cond = scores[lang] >= best
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
            best = F.when(cond, scores[lang]).otherwise(best)
    return pred


def code_switch(documents: DataFrame, win: int = CS_WIN) -> DataFrame:
    """(doc_id, n_windows, major_lang, n_off_major, boundary_switches,
    switch_milli) — per doc: window count, the majority window language
    (ties in LANG_ORDER), windows disagreeing with the majority, adjacent
    window disagreements, and the off-majority rate in milli."""
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    n = F.size(words)
    nw = F.expr(f"(size(filter(split(lower(text), ' '), w -> w != '')) + {win - 1}) div {win}").cast("int")
    idx = F.when(nw > 0, F.sequence(F.lit(0), nw - 1)).otherwise(
        F.array().cast("array<int>")
    )
    preds = F.transform(
        idx, lambda i: _window_pred(F.slice(words, i * win + 1, win))
    )
    # materialize _preds in its own Project FIRST: the majority fold below
    # references the predictions 8x, and inlining would replicate the
    # windowed-argmax subtree each time (the winnowing plan-size trap)
    with_preds = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        preds.alias("_preds"),
    )

    def lang_count(lang):
        return F.size(F.filter(F.col("_preds"), lambda p: p == lang))

    major = None
    best = None
    for lang in reversed(LANG_ORDER):
        if major is None:
            major = F.lit(lang)
            best = lang_count(lang)
        else:
            cond = lang_count(lang) >= best
            major = F.when(cond, F.lit(lang)).otherwise(major)
            best = F.when(cond, lang_count(lang)).otherwise(best)

    base = with_preds.select(
        "doc_id",
        "_preds",
        major.alias("major_lang"),
    )
    n_off = F.size(
        F.filter(F.col("_preds"), lambda p: p != F.col("major_lang"))
    ).cast("long")
    boundary = F.size(
        F.filter(
            F.zip_with(
                F.col("_preds"),
                F.slice(F.col("_preds"), 2, F.size("_preds")),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    ).cast("long")
    return base.select(
        "doc_id",
        F.size("_preds").cast("long").alias("n_windows"),
        "major_lang",
        n_off.alias("n_off_major"),
        boundary.alias("boundary_switches"),
        F.when(F.size("_preds") > 0, (F.lit(1000) * n_off))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_num"),
    ).select(
        "doc_id",
        "n_windows",
        "major_lang",
        "n_off_major",
        "boundary_switches",
        F.expr("CASE WHEN n_windows > 0 THEN _num div n_windows ELSE 0 END")
        .cast("long")
        .alias("switch_milli"),
    )


def sql_code_switch(table: str = "documents", win: int = CS_WIN) -> str:
    """DuckDB mirror: identical windowing, per-window argmax fold, majority
    vote, boundary count."""
    def hits(arr, lex):
        inl = ", ".join(f"'{w}'" for w in lex)
        return f"len(list_filter({arr}, w -> w IN ({inl})))"

    w_arr = f"list_slice(words, i * {win} + 1, (i + 1) * {win})"
    s = {lang: hits(w_arr, lex) for lang, lex in LEXICONS.items()}
    pred = f"'{LANG_ORDER[-1]}'"
    best = s[LANG_ORDER[-1]]
    for lang in reversed(LANG_ORDER[:-1]):
        pred = f"CASE WHEN {s[lang]} >= {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN {s[lang]} >= {best} THEN {s[lang]} ELSE {best} END"

    def lcount(lang):
        return f"len(list_filter(preds, p -> p = '{lang}'))"

    major = f"'{LANG_ORDER[-1]}'"
    mbest = lcount(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        major = f"CASE WHEN {lcount(lang)} >= {mbest} THEN '{lang}' ELSE {major} END"
        mbest = f"CASE WHEN {lcount(lang)} >= {mbest} THEN {lcount(lang)} ELSE {mbest} END"

    return f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM {table}
),
wined AS (
  SELECT doc_id,
         list_transform(range(0, (len(words) + {win - 1}) // {win}),
                        i -> {pred}) AS preds
  FROM base
),
scored AS (
  SELECT doc_id, preds, {major} AS major_lang FROM wined
)
SELECT doc_id,
       CAST(len(preds) AS BIGINT) AS n_windows,
       major_lang,
       CAST(len(list_filter(preds, p -> p <> major_lang)) AS BIGINT)
         AS n_off_major,
       CAST(len(list_filter(range(1, greatest(1::BIGINT, len(preds))),
                            i -> preds[i] <> preds[i + 1])) AS BIGINT)
         AS boundary_switches,
       CAST(CASE WHEN len(preds) > 0
                 THEN (1000 * len(list_filter(preds, p -> p <> major_lang)))
                      // len(preds)
                 ELSE 0 END AS BIGINT) AS switch_milli
FROM scored
"""


# ------------------------------------------------ MATTR lexical diversity
# Moving-Average Type-Token Ratio (Covington & McFall 2010): plain TTR
# falls with document length (long docs look artificially repetitive), so
# it cannot rank a mixed-length corpus; MATTR averages the TTR of every
# w-token sliding window, which is length-invariant. A low MATTR next to
# an acceptable repetition_stats score flags template/spun text whose
# repetition unit is longer than that operator's n-gram windows. hapax
# share (types occurring once) is the classic vocabulary-richness
# companion.
#
# Scale shape: ZERO shuffle — one narrow Project of in-row array algebra
# (per-window distinct counts over slices), no explode, no groupBy. The
# per-row cost is O(n_tokens * w); the plan-trap rule is respected: the
# only row gate is on the RAW text column, never on a derived array.

MATTR_W = 25  # window width (the literature's standard 25-100 range)


def mattr_diversity(documents: DataFrame, w: int = MATTR_W) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr_milli, mattr_milli, hapax_milli,
    n_windows) — per-doc lexical diversity. Docs shorter than `w` tokens
    fall back to whole-doc TTR with n_windows = 1 (the reference
    implementation's behavior)."""
    doc_id = F.col("doc_id").cast("string")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    base = documents.select(doc_id.alias("doc_id"), toks.alias("toks"))
    n = F.size("toks")
    types = F.size(F.array_distinct("toks"))
    # hapax census stays in-row: for each distinct type, its occurrence
    # count inside the SAME row's token array (O(n_types * n), bounded by
    # the per-doc length, never corpus-scaled)
    tk = F.col("toks")
    hapax = F.size(
        F.filter(
            F.array_distinct("toks"),
            lambda t: F.size(F.filter(tk, lambda x: x == t)) == 1,
        )
    )
    n_windows = F.when(n >= w, n - w + 1).otherwise(F.lit(1)).cast("long")
    win_sum = F.when(
        n >= w,
        F.aggregate(
            F.sequence(F.lit(1), n - w + 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.size(F.array_distinct(F.slice(tk, i, w))).cast("long"),
        ),
    ).otherwise(types.cast("long"))
    denom = F.when(n >= w, F.lit(w).cast("long") * (n - w + 1)).otherwise(
        F.greatest(F.lit(1).cast("long"), n.cast("long"))
    )
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        types.cast("long").alias("n_types"),
        win_sum.alias("_ws"),
        denom.alias("_den"),
        n_windows.alias("n_windows"),
        hapax.cast("long").alias("_hapax"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 0, F.expr("(1000 * n_types) div n_tokens")
        ).otherwise(F.lit(0)).cast("long").alias("ttr_milli"),
        F.expr("(1000 * _ws) div _den").cast("long").alias("mattr_milli"),
        F.when(
            F.col("n_types") > 0, F.expr("(1000 * _hapax) div n_types")
        ).otherwise(F.lit(0)).cast("long").alias("hapax_milli"),
        "n_windows",
    )


def sql_mattr_diversity(table: str = "documents", w: int = MATTR_W) -> str:
    """DuckDB mirror: identical tokenization, window distinct counts via
    list_slice/list_distinct, hapax via per-type in-row occurrence count."""
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM {table}
),
m AS (
  SELECT doc_id,
         len(toks) AS n,
         len(list_distinct(toks)) AS types,
         len(list_filter(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t)) = 1)) AS hapax,
         CASE WHEN len(toks) >= {w}
              THEN list_sum(list_transform(range(1, len(toks) - {w} + 2),
                   i -> len(list_distinct(list_slice(toks, i, i + {w} - 1)))))
              ELSE len(list_distinct(toks)) END AS ws,
         CASE WHEN len(toks) >= {w}
              THEN {w} * (len(toks) - {w} + 1)
              ELSE GREATEST(1, len(toks)) END AS den,
         CASE WHEN len(toks) >= {w} THEN len(toks) - {w} + 1 ELSE 1 END
           AS n_windows
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(types AS BIGINT) AS n_types,
       CAST(CASE WHEN n > 0 THEN (1000 * types) // n ELSE 0 END AS BIGINT)
         AS ttr_milli,
       CAST((1000 * ws) // den AS BIGINT) AS mattr_milli,
       CAST(CASE WHEN types > 0 THEN (1000 * hapax) // types ELSE 0 END
            AS BIGINT) AS hapax_milli,
       CAST(n_windows AS BIGINT) AS n_windows
FROM m
"""


# ------------------------------------------------------- gate agreement
# Inter-gate agreement between the two quality filters (the rule gate and
# the model gate): Cohen's kappa in integer milli plus the full 2x2
# confusion census. Curation suites run both gates; kappa is the number
# that says whether the model adds signal beyond the rules (kappa << 1)
# or is a re-implementation of them (kappa ~ 1) — i.e. whether paying the
# model's serving cost buys any selectivity.

GATE_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def gate_flags(documents: DataFrame) -> DataFrame:
    """(doc_id, rk, ck) — both quality-gate verdicts per document in ONE
    narrow Project (the rule gate is Column algebra, the classifier is the
    hashed linear scorer: same row, same pass, no join). Shared by the
    batch kappa aggregate and the streaming twin so the two cannot
    drift."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_wlen = F.length(F.regexp_replace("text", " ", "")) / n_words
    digit_words = F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*GATE_STOPWORDS)))
    rule_keep = (
        (n_words >= 5)
        & (n_words <= 100000)
        & (mean_wlen >= 2.0)
        & (mean_wlen <= 12.0)
        & ((digit_words / n_words) <= 0.3)
        & (stop_hits >= 1)
    )

    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    half = (QC_WEIGHT_MOD - 1) // 2
    weights = F.transform(
        toks,
        lambda t: (_qc_bucket(t) * F.lit(QC_WEIGHT_MULT)) % QC_WEIGHT_MOD
        - F.lit(half),
    )
    w_total = F.aggregate(weights, F.lit(0).cast("long"), lambda a, x: a + x)
    n_tok = F.size(toks).cast("long")
    # raw pieces materialize in one Project; the guarded integer div runs
    # in the next so the aggregate-fold is evaluated once per row
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        rule_keep.alias("rk"),
        w_total.alias("w_total"),
        n_tok.alias("n_tok"),
    ).select(
        "doc_id",
        "rk",
        (
            F.when(F.col("n_tok") > 0, F.expr("(1000 * w_total) div n_tok"))
            .otherwise(F.lit(0))
            .cast("long")
            >= QC_THRESHOLD_MILLI
        ).alias("ck"),
    )


def gate_agreement(documents: DataFrame) -> DataFrame:
    """1-row (n, both_keep, rule_only, clf_only, both_drop, agree_pm,
    kappa_milli). Both gates evaluate in ONE narrow Project (gate_flags),
    then one global conditional-sum aggregate. Zero shuffle at any corpus
    size; kappa's numerator/denominator are exact int64 (n^2 terms: safe
    to ~3*10^9 docs per exact pass, past that the census row still merges
    exactly — only the final ratio needs the wider type)."""
    flags = gate_flags(documents)
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("rk") & F.col("ck")).cast("long")).alias("both_keep"),
        F.sum((F.col("rk") & ~F.col("ck")).cast("long")).alias("rule_only"),
        F.sum((~F.col("rk") & F.col("ck")).cast("long")).alias("clf_only"),
        F.sum((~F.col("rk") & ~F.col("ck")).cast("long")).alias("both_drop"),
    )
    pe_num = (
        "(both_keep + rule_only) * (both_keep + clf_only)"
        " + (clf_only + both_drop) * (rule_only + both_drop)"
    )
    return agg.select(
        "n",
        "both_keep",
        "rule_only",
        "clf_only",
        "both_drop",
        F.expr("(1000 * (both_keep + both_drop)) div n")
        .cast("long")
        .alias("agree_pm"),
        F.expr(
            f"CASE WHEN n * n - ({pe_num}) = 0 THEN 1000"
            f" ELSE (1000 * (n * (both_keep + both_drop) - ({pe_num})))"
            f" div (n * n - ({pe_num})) END"
        )
        .cast("long")
        .alias("kappa_milli"),
    )


def sql_gate_agreement(table: str = "documents") -> str:
    """DuckDB mirror of gate_agreement."""
    stops = GATE_STOPWORDS
    rule = (
        "(len(string_split(text, ' ')) BETWEEN 5 AND 100000)"
        " AND (length(replace(text, ' ', '')) * 1.0"
        "      / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0)"
        " AND (len(list_filter(string_split(text, ' '),"
        "                      w -> regexp_full_match(w, '[0-9]+')))"
        "      * 1.0 / len(string_split(text, ' ')) <= 0.3)"
        f" AND (len(list_filter(string_split(text, ' '), w -> w IN {stops!r})) >= 1)"
    )
    half = (QC_WEIGHT_MOD - 1) // 2
    bucket = f"(('0x' || substr(md5('qc|' || t), 1, 8))::BIGINT % {QC_BUCKETS})"
    w = f"(({bucket} * {QC_WEIGHT_MULT}) % {QC_WEIGHT_MOD} - {half})"
    pe_num = (
        "(both_keep + rule_only) * (both_keep + clf_only)"
        " + (clf_only + both_drop) * (rule_only + both_drop)"
    )
    return f"""
WITH flags AS (
  SELECT ({rule}) AS rk,
         (CASE WHEN len(list_filter(string_split(lower(text), ' '), t -> t <> '')) > 0
               THEN (1000 * COALESCE(list_sum(list_transform(
                      list_filter(string_split(lower(text), ' '), t -> t <> ''),
                      t -> {w})), 0))
                    // len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               ELSE 0 END) >= {QC_THRESHOLD_MILLI} AS ck
  FROM {table}
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE rk AND ck) AS BIGINT) AS both_keep,
         CAST(COUNT(*) FILTER (WHERE rk AND NOT ck) AS BIGINT) AS rule_only,
         CAST(COUNT(*) FILTER (WHERE NOT rk AND ck) AS BIGINT) AS clf_only,
         CAST(COUNT(*) FILTER (WHERE NOT rk AND NOT ck) AS BIGINT) AS both_drop
  FROM flags
)
SELECT n, both_keep, rule_only, clf_only, both_drop,
       CAST((1000 * (both_keep + both_drop)) // n AS BIGINT) AS agree_pm,
       CAST(CASE WHEN n * n - ({pe_num}) = 0 THEN 1000
            ELSE (1000 * (n * (both_keep + both_drop) - ({pe_num})))
                 // (n * n - ({pe_num})) END AS BIGINT) AS kappa_milli
FROM agg
"""


# --------------------------------------------------------- OCR damage gate
# Scanned-PDF pipelines (the reference's home turf) receive OCR output whose
# characteristic damage — glyph confusions ('m' read as 'rn') and broken
# words ('the' split as 't he') — survives every other hygiene gate: the
# words are ASCII, the stopwords are there, the perplexity barely moves.
# This gate measures the two signatures directly. The synthesizer plants
# both transforms on an md5-selected ~1/8 of docs; docs where neither
# transform takes (no 'm', no ' the ') are planted-but-silent and the
# detector is only accountable for docs the damage actually changed.

OCR_RN_PM = 8  # 'rn' bigrams per 1000 chars; clean prose sits far below


def synthesize_ocr_corpus(documents: DataFrame) -> DataFrame:
    """documents with OCR damage planted on the md5 'ocr' bucket: 'm' ->
    'rn' (glyph confusion) and ' the ' -> ' t he ' (broken word)."""
    planted = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ocr|"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 8
        == 0
    )
    damaged = F.replace(
        F.replace(F.col("text"), F.lit("m"), F.lit("rn")),
        F.lit(" the "),
        F.lit(" t he "),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(planted, damaged).otherwise(F.col("text")).alias("text"),
    )


def ocr_artifacts(docs: DataFrame) -> DataFrame:
    """(doc_id, rn_pm, broken_the, ocr_flag) — the OCR damage gate: 'rn'
    bigram density per mille of chars, the broken-stopword marker, and the
    disjunctive flag. ONE narrow Project, zero shuffle, zero Python — a
    100 TB pass is a pure map over the scan (the web_pii_redact class)."""
    rn_pm = F.expr(
        "CASE WHEN length(text) > 0"
        " THEN (1000 * (length(text) - length(replace(text, 'rn', ''))) div 2)"
        "      div length(text)"
        " ELSE 0 END"
    ).cast("long")
    broken = F.col("text").contains(" t he ")
    return docs.select(
        "doc_id",
        rn_pm.alias("rn_pm"),
        broken.alias("broken_the"),
        ((rn_pm >= OCR_RN_PM) | broken).alias("ocr_flag"),
    )


def sql_ocr_artifacts(table: str = "documents") -> str:
    """DuckDB mirror of ocr_artifacts over the OCR damage synthesis."""
    planted = (
        "(('0x' || substr(md5('ocr|' || CAST(doc_id AS VARCHAR)), 1, 4))"
        "::BIGINT % 8) = 0"
    )
    damaged = "replace(replace(text, 'm', 'rn'), ' the ', ' t he ')"
    rn_pm = (
        "CAST(CASE WHEN length(text) > 0"
        " THEN (1000 * ((length(text) - length(replace(text, 'rn', ''))) // 2))"
        "      // length(text)"
        " ELSE 0 END AS BIGINT)"
    )
    return f"""
WITH synth AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN {planted} THEN {damaged} ELSE text END AS text
  FROM {table}
)
SELECT doc_id, {rn_pm} AS rn_pm,
       (text LIKE '% t he %') AS broken_the,
       ({rn_pm} >= {OCR_RN_PM} OR text LIKE '% t he %') AS ocr_flag
FROM synth
"""
