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

from pyspark.sql import DataFrame, functions as F

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
