"""BPE merge training: learn the top-K byte-pair merges over the corpus.

The tokenizer-training pass of a training-data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"): start
from characters + an end-of-word marker, repeatedly merge the globally most
frequent adjacent symbol pair. `textops.bpe_token_stats` applies a FIXED
tokenization; this module LEARNS the merge table — the reference pipeline's
missing-by-design analog (the reference has no trainable stage), included
because a 100 TB corpus engine trains its tokenizer on the corpus it cleans.

Spark shape (the CC-fixpoint pattern, functions/dedup.connected_components):
- ONE wide shuffle up front: word -> count (the vocabulary table; all later
  rounds run on distinct words, each weighted by its count — corpus size
  drops out after this stage).
- per round: one vocab-sized aggregation for pair counts, a 1-ROW collect
  (the argmax pair — the only driver traffic, same as the fixpoint's
  changed-count), and a map-side `replace` applying the merge;
  `localCheckpoint` keeps the lineage flat across rounds.
- symbol sequences are stored as a DOUBLE-separator-padded string
  ("\\x1f\\x1fa\\x1f\\x1fb\\x1f\\x1f…"): applying a merge is then a plain
  non-overlapping left-to-right string replace of "\\x1fa\\x1f\\x1fb\\x1f"
  with "\\x1fab\\x1f", which consumes one half of each boundary and leaves
  the other half for the NEXT adjacent match — exactly the fold semantics
  BPE needs ("abab" -> [ab][ab], "aaa" -> [aa][a]) without any per-row
  Python or O(n^2) array rebuilds.

Tie-break is total and engine-independent: (count DESC, left ASC, right
ASC). The DuckDB oracle (sql_bpe_train_merges) unrolls the same K rounds
as chained CTEs over the same padded-string representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"  # unit separator: never appears in corpus text or '</w>'
SEP2 = SEP + SEP
EOW = "</w>"
N_MERGES = 8


def _initial_state(documents: DataFrame) -> DataFrame:
    """(c, s): word count + padded symbol string (chars + EOW)."""
    wc = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = F.concat(
        F.lit(SEP2),
        F.regexp_replace("w", "(.)", "$1" + SEP2),
        F.lit(EOW + SEP2),
    )
    return wc.select("c", s.alias("s"))


def _train_merges_py(documents: DataFrame, n_merges: int = N_MERGES) -> list:
    """The trainer loop, returning the merge table as a Python list of
    (round, left_sym, right_sym, pair_count). Driver traffic is the K
    one-row argmax collects the module docstring audits; the list itself is
    K rows — bounded by the n_merges constant, never by the corpus."""
    state = _initial_state(documents).localCheckpoint(eager=True)
    merges = []
    for r in range(1, n_merges + 1):
        arr = F.filter(F.split("s", SEP2), lambda x: x != "")
        adjacent = F.transform(
            F.sequence(F.lit(1), F.size("l") - 1),
            lambda i: F.struct(
                F.element_at("l", i).alias("a"),
                F.element_at("l", i + 1).alias("b"),
            ),
        )
        # sequence(1, 0) DESCENDS: a fully-merged word (one symbol left)
        # must contribute an empty pair list, not an out-of-bounds index
        pairs = state.select("c", arr.alias("l")).select(
            "c",
            F.explode(
                F.when(F.size("l") >= 2, adjacent).otherwise(
                    F.array().cast("array<struct<a:string,b:string>>")
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((r, a, b, cnt))
        pat = SEP + a + SEP2 + b + SEP
        rep = SEP + a + b + SEP
        state = state.withColumn(
            "s", F.replace("s", F.lit(pat), F.lit(rep))
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_merges(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(round, left_sym, right_sym, pair_count) — the learned merge table,
    one row per round in merge order."""
    return documents.sparkSession.createDataFrame(
        _train_merges_py(documents, n_merges),
        "round int, left_sym string, right_sym string, pair_count long",
    )


def bpe_encode(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(doc_id, n_words, n_tokens_bpe, first_word_tokens) — apply the
    corpus-trained merge table to every document (the tokenizer-APPLICATION
    pass; bpe_train_merges is the training pass). Encoding is the same
    padded-string replace fold the trainer uses, expressed as a pure Column
    chain: each word is padded to its symbol string, the K merges are
    applied in rank order as non-overlapping left-to-right replaces, and
    the surviving symbol count is the token count. One narrow pass over the
    corpus — the merge table itself is K constants (collected by the
    trainer's audited 1-row-per-round driver traffic), so encoding adds NO
    shuffle and no per-row Python.

    first_word_tokens (the first word's symbols joined by spaces) makes the
    tokenization itself part of the checked relation, not just its size."""
    merges = _train_merges_py(documents, n_merges)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    toks = F.transform(words, _encode_word_col(merges))
    n_tokens = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.size(t)
    )
    first = F.when(
        F.size(toks) > 0, F.array_join(F.element_at(toks, 1), " ")
    ).otherwise(F.lit(""))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(words).cast("long").alias("n_words"),
        n_tokens.alias("n_tokens_bpe"),
        first.alias("first_word_tokens"),
    )


def sql_bpe_encode(n_merges: int = N_MERGES, table: str = "documents") -> str:
    """DuckDB mirror: the training CTE chain of sql_bpe_train_merges plus
    the same per-word replace fold, merge literals pulled from the m{r}
    CTEs as scalar subqueries."""
    train = sql_bpe_train_merges(n_merges, table)
    ctes = train[len("WITH ") : train.index("\nSELECT round")]
    # DuckDB forbids scalar subqueries INSIDE lambda bodies, so the merge
    # scalars are hoisted into a one-row CTE cross-joined onto the corpus;
    # the lambda then references them as plain (correlated) columns
    mm_cols = ", ".join(
        f"(SELECT a FROM m{r}) AS a{r}, (SELECT b FROM m{r}) AS b{r}"
        for r in range(1, n_merges + 1)
    )
    pad = f"'{SEP2}' || regexp_replace(w, '(.)', '\\1{SEP2}', 'g') || '{EOW}{SEP2}'"
    s = pad
    for r in range(1, n_merges + 1):
        s = (
            f"replace({s}, '{SEP}' || a{r} || '{SEP2}' || b{r} || '{SEP}', "
            f"'{SEP}' || a{r} || b{r} || '{SEP}')"
        )
    return f"""WITH {ctes},
mm AS (SELECT {mm_cols}),
enc AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_transform(
           list_filter(string_split(text, ' '), w -> w <> ''),
           w -> list_filter(string_split({s}, '{SEP2}'), x -> x <> '')
         ) AS toks,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words
  FROM {table} CROSS JOIN mm)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(COALESCE(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT)
         AS n_tokens_bpe,
       CASE WHEN len(toks) > 0 THEN array_to_string(toks[1], ' ')
            ELSE '' END AS first_word_tokens
FROM enc"""


def sql_bpe_train_merges(n_merges: int = N_MERGES, table: str = "documents") -> str:
    """The same K rounds unrolled as chained CTEs (independent formulation:
    list slicing + scalar-subquery argmax per round)."""
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table})
  WHERE w <> '' GROUP BY w),
s0 AS MATERIALIZED (
  SELECT c, '{SEP2}' || regexp_replace(w, '(.)', '\\1{SEP2}', 'g')
         || '{EOW}{SEP2}' AS s
  FROM w0)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT l[i] AS a, l[i+1] AS b, SUM(c) AS cnt
  FROM (SELECT c, list_filter(string_split(s, '{SEP2}'), x -> x <> '') AS l
        FROM s{p}),
       unnest(range(1, len(l))) u(i)
  GROUP BY 1, 2),
m{r} AS MATERIALIZED (SELECT {r} AS round, a, b, cnt FROM p{r}
         ORDER BY cnt DESC, a, b LIMIT 1),
s{r} AS MATERIALIZED (
  SELECT c, replace(s,
    '{SEP}' || (SELECT a FROM m{r}) || '{SEP2}' || (SELECT b FROM m{r}) || '{SEP}',
    '{SEP}' || (SELECT a FROM m{r}) || (SELECT b FROM m{r}) || '{SEP}') AS s
  FROM s{p})"""
        )
    # CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas widens to
    # float64 — the driver's stringified value hash would then see
    # '4568.0' vs Spark's '4568' and hard-FAIL despite equal values
    finals = "\nUNION ALL\n".join(
        f"SELECT round, a AS left_sym, b AS right_sym, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals + "\nORDER BY round"


# ---------------------------------------------------- per-language fit audit
def _encode_word_col(merges):
    """The per-word padded-string replace fold as a Column builder, shared
    by bpe_encode and tokenizer_fit."""

    def encode_word(w):
        s = F.concat(
            F.lit(SEP2),
            F.regexp_replace(w, "(.)", "$1" + SEP2),
            F.lit(EOW + SEP2),
        )
        for _r, a, b, _c in merges:
            s = F.replace(
                s, F.lit(SEP + a + SEP2 + b + SEP), F.lit(SEP + a + b + SEP)
            )
        return F.filter(F.split(s, SEP2), lambda x: x != "")

    return encode_word


def tokenizer_fit(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(pred_lang, n_docs, n_words, n_tokens_bpe, n_fallback_words,
    fertility_milli, fallback_pm) — how well the corpus-trained BPE fits
    each language: fertility (BPE tokens per word) and the FALLBACK rate
    (words no merge touched — encoded at one symbol per character, the
    'tokenizer never saw this language' signal). Multilingual tokenizer
    audits read exactly this table: a language whose fallback_pm is high is
    under-served by the merge inventory and will train at 2-4x the token
    cost (the fertility tax).

    Scale shape: training cost is bpe_train_merges' (vocabulary-sized
    rounds, audited 1-row collects); the audit itself is ONE narrow Project
    (language argmax + per-word encode fold, same scan) and ONE |langs|-key
    aggregation with map-side partials. Zero joins: language and counts
    derive from the same row, never re-shuffled."""
    from .textops import LANG_ORDER, LEXICONS

    merges = _train_merges_py(documents, n_merges)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    enc = _encode_word_col(merges)
    per_word = F.transform(
        words,
        lambda w: F.struct(
            F.size(enc(w)).cast("long").alias("nt"),
            (F.size(enc(w)) == F.length(w) + 1).cast("long").alias("fb"),
        ),
    )
    n_tokens = F.aggregate(
        per_word, F.lit(0).cast("long"), lambda acc, s: acc + s["nt"]
    )
    n_fb = F.aggregate(
        per_word, F.lit(0).cast("long"), lambda acc, s: acc + s["fb"]
    )

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
        n_tokens.alias("n_t"),
        n_fb.alias("n_f"),
    )
    agg = one.groupBy("pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_w").alias("n_words"),
        F.sum("n_t").alias("n_tokens_bpe"),
        F.sum("n_f").alias("n_fallback_words"),
    )
    return agg.select(
        "pred_lang",
        "n_docs",
        "n_words",
        "n_tokens_bpe",
        "n_fallback_words",
        F.when(
            F.col("n_words") > 0, F.expr("(1000 * n_tokens_bpe) div n_words")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fertility_milli"),
        F.when(
            F.col("n_words") > 0,
            F.expr("(1000 * n_fallback_words) div n_words"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fallback_pm"),
    ).orderBy("pred_lang")


def sql_tokenizer_fit(n_merges: int = N_MERGES, table: str = "documents") -> str:
    """DuckDB mirror: the training CTE chain + the same per-word fold,
    language via the sql_language_id join (mirror-independent plan)."""
    from .textops import sql_language_id

    train = sql_bpe_train_merges(n_merges, table)
    ctes = train[len("WITH ") : train.index("\nSELECT round")]
    mm_cols = ", ".join(
        f"(SELECT a FROM m{r}) AS a{r}, (SELECT b FROM m{r}) AS b{r}"
        for r in range(1, n_merges + 1)
    )
    pad = f"'{SEP2}' || regexp_replace(w, '(.)', '\\1{SEP2}', 'g') || '{EOW}{SEP2}'"
    s = pad
    for r in range(1, n_merges + 1):
        s = (
            f"replace({s}, '{SEP}' || a{r} || '{SEP2}' || b{r} || '{SEP}', "
            f"'{SEP}' || a{r} || b{r} || '{SEP}')"
        )
    ntok = f"len(list_filter(string_split({s}, '{SEP2}'), x -> x <> ''))"
    return f"""WITH {ctes},
mm AS (SELECT {mm_cols}),
lid AS ({sql_language_id(table)}),
enc AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
           AS n_w,
         CAST(COALESCE(list_sum(list_transform(
           list_filter(string_split(text, ' '), w -> w <> ''),
           w -> {ntok})), 0) AS BIGINT) AS n_t,
         CAST(COALESCE(list_sum(list_transform(
           list_filter(string_split(text, ' '), w -> w <> ''),
           w -> CASE WHEN {ntok} = length(w) + 1 THEN 1 ELSE 0 END)), 0)
           AS BIGINT) AS n_f
  FROM {table} CROSS JOIN mm),
agg AS (
  SELECT pred_lang, COUNT(*)::BIGINT AS n_docs, SUM(n_w)::BIGINT AS n_words,
         SUM(n_t)::BIGINT AS n_tokens_bpe,
         SUM(n_f)::BIGINT AS n_fallback_words
  FROM lid JOIN enc USING (doc_id)
  GROUP BY pred_lang
)
SELECT pred_lang, n_docs, n_words, n_tokens_bpe, n_fallback_words,
       CAST(CASE WHEN n_words > 0 THEN (1000 * n_tokens_bpe) // n_words
            ELSE 0 END AS BIGINT) AS fertility_milli,
       CAST(CASE WHEN n_words > 0 THEN (1000 * n_fallback_words) // n_words
            ELSE 0 END AS BIGINT) AS fallback_pm
FROM agg
ORDER BY pred_lang"""
