"""End-to-end curation pipeline as ONE per-document flag relation — the
driver-gated twin of jobs/hygiene_job.py (same stage order, same rules):

    boilerplate-line strip -> PII redaction -> Gopher quality gates ->
    unigram-LM perplexity gate -> exact-dedup keeper -> hash sample

The job writes parquet + metrics via spark-submit; this operator returns
the per-doc audit relation (every stage a FLAG column, nothing dropped
silently) so the whole chain — not just its stages in isolation — is
value-hash-checked against a DuckDB mirror by the driver's correctness
gate. A doc's `keep` here is exactly the job's keep rule at the same
dials.

Scale shape (inherited from the stages): ONE boilerplate census feeding a
cap-bounded broadcast set, a narrow strip + redact + quality Project, the
LM token census + one doc_id score join, one keeper shuffle on the content
hash, a stateless md5 sample — the corpus is traversed, never re-filtered
stage by stage. The stripped/redacted text is deliberately NOT
checkpointed: it is corpus-sized (the expensive side of the dedup-module
checkpoint rule), and its producers are narrow Projects that whole-stage
codegen re-runs cheaply per consumer (the LM pass and the final select);
the job variant materializes it to parquet instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import textops, webclean

CURATION_SAMPLE_PCT = 90  # keep ~90/100 md5 buckets (the job's --sample-pct)
# same gate vocabulary as queries.q_text_quality_rules and jobs/hygiene_job.py
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _curation_frame(
    documents: DataFrame,
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> DataFrame:
    """The full per-doc audit frame (all flag columns + keep + the
    post-strip redacted text) — curation_flags drops the text,
    curation_packed packs the keepers' text."""
    web = webclean.synthesize_web(documents).select("doc_id", "web_text")
    st = webclean.strip_boilerplate(web, min_df, cap)

    t = F.col("clean_text")
    n_pii = (
        F.regexp_count(t, F.lit(webclean.RE_EMAIL))
        + F.regexp_count(t, F.lit(webclean.RE_URL))
        + F.regexp_count(t, F.lit(webclean.RE_IPV4))
        + F.regexp_count(t, F.lit(webclean.RE_PHONE))
    )
    red = F.regexp_replace(t, webclean.RE_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, webclean.RE_URL, "<URL>")
    red = F.regexp_replace(red, webclean.RE_IPV4, "<IP>")
    red = F.regexp_replace(red, webclean.RE_PHONE, "<PHONE>")
    base = st.select(
        "doc_id",
        F.col("n_removed").cast("int").alias("boiler_removed"),
        n_pii.cast("int").alias("pii_found"),
        red.alias("text"),
    )
    # The fixture carries no duplicate texts, so the keeper stage's
    # structure is planted (the synthesizer pattern): an md5-selected ~1/8
    # of post-strip docs reappears verbatim under doc_id 'd'||doc_id — 'd'
    # sorts after every digit, so the original doc is always the keeper in
    # both engines. Planted AFTER the strip so the boilerplate census (a
    # corpus-frequency object) is computed over the un-planted corpus
    # identically in both engines.
    plant = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("curp|"), F.col("doc_id"))), 1, 4),
            16,
            10,
        ).cast("long")
        % 8
        == 0
    )
    base = base.unionByName(
        base.filter(plant).select(
            F.concat(F.lit("d"), F.col("doc_id")).alias("doc_id"),
            "boiler_removed",
            "pii_found",
            "text",
        )
    )

    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_wlen = F.length(F.regexp_replace("text", " ", "")) / n_words
    digit_words = F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ok_quality = (
        (n_words >= 5)
        & (n_words <= 100000)
        & (mean_wlen >= 2.0)
        & (mean_wlen <= 12.0)
        & ((digit_words / n_words) <= 0.3)
        & (stop_hits >= 1)
    )
    flagged = base.withColumn("ok_quality", ok_quality)

    # model-based half of the quality filter: LM trained on the post-strip
    # redacted corpus itself; docs with zero tokens carry no LM evidence
    # and stay unflagged (the rule gates already reject them)
    ppx = textops.unigram_perplexity(flagged.select("doc_id", "text")).select(
        "doc_id", "ppx_flag"
    )
    flagged = flagged.join(ppx, "doc_id", "left").withColumn(
        "ppx_flag", F.coalesce(F.col("ppx_flag"), F.lit(False))
    )

    keeper = (
        F.row_number().over(
            Window.partitionBy(F.md5("text")).orderBy("doc_id")
        )
        == 1
    )
    h = F.md5(F.concat(F.lit("sample|"), F.col("doc_id")))
    sampled = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 100 < sample_pct
    )
    return flagged.select(
        "doc_id",
        "boiler_removed",
        "pii_found",
        "ok_quality",
        "ppx_flag",
        keeper.alias("is_keeper"),
        sampled.alias("sampled"),
        (
            F.col("ok_quality")
            & ~F.col("ppx_flag")
            & keeper
            & sampled
        ).alias("keep"),
        "text",
    )


def curation_flags(
    documents: DataFrame,
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> DataFrame:
    """(doc_id, boiler_removed, pii_found, ok_quality, ppx_flag,
    is_keeper, sampled, keep) for every document of the synthesized web
    corpus — keep = ok_quality AND NOT ppx_flag AND is_keeper AND
    sampled."""
    return _curation_frame(documents, min_df, cap, sample_pct).drop("text")


def curation_kept(
    documents: DataFrame,
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> DataFrame:
    """The release keeper set (doc_id, redacted post-strip text): the
    keep=true rows of the curation audit frame — what downstream split /
    pack / release stages consume."""
    return (
        _curation_frame(documents, min_df, cap, sample_pct)
        .filter("keep")
        .select("doc_id", "text")
    )


def curation_packed(
    documents: DataFrame,
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> DataFrame:
    """The job's --pack-budget tail as a driver-gated query: the curation
    keepers' redacted text greedily packed into fixed-token-budget
    pretraining sequences (functions/packing over the keep=true set) —
    the last stage of the hygiene recipe, composed end-to-end. One extra
    shuffle on the pack-stream key beyond the curation chain."""
    from . import packing

    kept = curation_kept(documents, min_df, cap, sample_pct)
    return packing.pack_sequences(kept)


def _sql_flagged_body(
    table: str = "documents",
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> str:
    """The shared CTE chain up to `flagged` (all flag columns + text)."""
    def cnt(pat: str) -> str:
        return f"len(regexp_extract_all(clean_text, '{pat}'))"

    red = "clean_text"
    for pat, tok in (
        (webclean.RE_EMAIL, "<EMAIL>"),
        (webclean.RE_URL, "<URL>"),
        (webclean.RE_IPV4, "<IP>"),
        (webclean.RE_PHONE, "<PHONE>"),
    ):
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    stops = STOPWORDS
    quality = (
        "(len(string_split(text, ' ')) BETWEEN 5 AND 100000)"
        " AND (length(replace(text, ' ', '')) * 1.0"
        "      / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0)"
        " AND (len(list_filter(string_split(text, ' '),"
        "                      w -> regexp_full_match(w, '[0-9]+')))"
        "      * 1.0 / len(string_split(text, ' ')) <= 0.3)"
        f" AND (len(list_filter(string_split(text, ' '), w -> w IN {stops!r})) >= 1)"
    )
    return f"""
st AS ({webclean.sql_strip_boilerplate(table, min_df, cap)}),
base0 AS (
  SELECT doc_id,
         CAST(n_removed AS INT) AS boiler_removed,
         CAST({cnt(webclean.RE_EMAIL)} + {cnt(webclean.RE_URL)}
              + {cnt(webclean.RE_IPV4)} + {cnt(webclean.RE_PHONE)} AS INT)
           AS pii_found,
         {red} AS text
  FROM st
),
base AS (
  SELECT * FROM base0
  UNION ALL
  SELECT 'd' || doc_id, boiler_removed, pii_found, text FROM base0
  WHERE ('0x' || substr(md5('curp|' || doc_id), 1, 4))::BIGINT % 8 = 0
),
ppx AS (
  SELECT doc_id, ppx_flag FROM ({textops.sql_unigram_perplexity('base')})
),
flagged AS (
  SELECT b.doc_id, b.boiler_removed, b.pii_found,
         ({quality}) AS ok_quality,
         COALESCE(p.ppx_flag, FALSE) AS ppx_flag,
         (ROW_NUMBER() OVER (PARTITION BY md5(b.text) ORDER BY b.doc_id) = 1)
           AS is_keeper,
         (('0x' || substr(md5('sample|' || b.doc_id), 1, 4))::BIGINT % 100
          < {sample_pct}) AS sampled,
         b.text
  FROM base b LEFT JOIN ppx p USING (doc_id)
)"""


def sql_curation_flags(
    table: str = "documents",
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> str:
    return f"""
WITH {_sql_flagged_body(table, min_df, cap, sample_pct)}
SELECT doc_id, boiler_removed, pii_found, ok_quality, ppx_flag, is_keeper,
       sampled,
       (ok_quality AND NOT ppx_flag AND is_keeper AND sampled) AS keep
FROM flagged
"""


def sql_curation_kept(
    table: str = "documents",
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> str:
    return f"""
WITH {_sql_flagged_body(table, min_df, cap, sample_pct)}
SELECT doc_id, text FROM flagged
WHERE ok_quality AND NOT ppx_flag AND is_keeper AND sampled
"""


def sql_curation_packed(
    table: str = "documents",
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> str:
    from . import packing

    return packing.sql_pack_sequences(
        f"({sql_curation_kept(table, min_df, cap, sample_pct)})"
    )


# ----------------------------------------------- leakage-safe corpus split
# Train/val/test splitting for training corpora: a deterministic md5 coin
# keyed on the NEAR-DUP GROUP (the connected-component representative from
# the MinHash-LSH pair graph), not on the document — so near-duplicates can
# never straddle a split boundary and leak training text into eval sets.
# The audit relation proves it: cross-split near-dup pairs are 0 BY
# CONSTRUCTION under group keying, and the naive doc-keyed counterfactual
# count shows exactly how many leaking pairs that keying would have let
# through on this corpus.

SPLIT_TRAIN_PM = 980  # [0, 980) train
SPLIT_VAL_PM = 990    # [980, 990) val; [990, 1000) test


def _split_of(key_col: F.Column) -> F.Column:
    pm = (
        F.conv(F.substring(F.md5(key_col), 1, 15), 16, 10).cast("long") % 1000
    )
    return (
        F.when(pm < SPLIT_TRAIN_PM, F.lit("train"))
        .when(pm < SPLIT_VAL_PM, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _group_assignments(documents: DataFrame):
    """(assign, pairs): the per-doc (doc_id, group_key, split) relation and
    the checkpointed pair graph it derives from (shared by the audit so the
    LSH mining plan runs once, not twice)."""
    from . import dedup

    pairs = dedup.lsh_candidate_pairs(documents).localCheckpoint(eager=False)
    reps = dedup.connected_components(pairs)
    docs = documents.select(F.col("doc_id").cast("string").alias("doc_id"))
    assign = docs.join(reps, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("rep"), F.col("doc_id")).alias("group_key"),
    )
    return assign.withColumn("split", _split_of(F.col("group_key"))), pairs


def leakage_safe_split(documents: DataFrame) -> DataFrame:
    """(doc_id, group_key, split) — every document assigned to
    train/val/test by an md5 per-mille coin on its near-dup group key.

    100 TB shape: the pair graph + CC keeper are the existing bounded
    dedup kernels; the only new work is ONE left join of the component
    reps onto the corpus and a narrow hash Project — no window, no sort."""
    assign, _ = _group_assignments(documents)
    return assign


def split_leakage_audit(documents: DataFrame) -> DataFrame:
    """(metric, value): per-split doc counts, near-dup group count,
    cross-split near-dup pairs under group keying (0 by construction —
    both pair endpoints share a component, hence a group, hence a split),
    and the doc-keyed counterfactual (the leakage a naive per-doc coin
    would have caused). The counterfactual needs NO join: both endpoint
    splits are in-row hashes of the pair columns."""
    assign, pairs = _group_assignments(documents)
    assign = assign.localCheckpoint(eager=False)  # feeds counts + two joins

    by_split = assign.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("value")
    ).select(F.concat(F.lit("docs_"), F.col("split")).alias("metric"), "value")

    groups = (
        assign.filter(F.col("group_key") != F.col("doc_id"))
        .agg(F.countDistinct("group_key").cast("long").alias("value"))
        .select(F.lit("near_dup_groups").alias("metric"), "value")
    )

    a = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    b = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    cross = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("split_a") != F.col("split_b"), 1)), F.lit(0)
            ).cast("long").alias("value")
        )
        .select(F.lit("cross_split_pairs").alias("metric"), "value")
    )

    naive = pairs.agg(
        F.coalesce(
            F.sum(
                F.when(
                    _split_of(F.col("doc_a")) != _split_of(F.col("doc_b")), 1
                )
            ),
            F.lit(0),
        ).cast("long").alias("value")
    ).select(F.lit("cross_split_pairs_naive").alias("metric"), "value")

    return by_split.unionByName(groups).unionByName(cross).unionByName(naive)


def _sql_split_case(key: str) -> str:
    pm = f"(('0x' || substr(md5({key}), 1, 15))::BIGINT % 1000)"
    return (
        f"CASE WHEN {pm} < {SPLIT_TRAIN_PM} THEN 'train' "
        f"WHEN {pm} < {SPLIT_VAL_PM} THEN 'val' ELSE 'test' END"
    )


def _sql_assign(table: str) -> str:
    from . import dedup

    cc = dedup.sql_connected_components(dedup.sql_lsh_candidate_pairs(table))
    return f"""
cc AS ({cc}),
docs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM {table}),
assign AS (
  SELECT doc_id, group_key, {_sql_split_case('group_key')} AS split
  FROM (SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS group_key
        FROM docs d LEFT JOIN cc c USING (doc_id))
)"""


def sql_leakage_safe_split(table: str = "documents") -> str:
    return f"WITH {_sql_assign(table)} SELECT doc_id, group_key, split FROM assign"


def sql_split_leakage_audit(table: str = "documents") -> str:
    from . import dedup

    pairs = dedup.sql_lsh_candidate_pairs(table)
    return f"""
WITH {_sql_assign(table)},
pairs AS ({pairs})
SELECT 'docs_' || split AS metric, COUNT(*)::BIGINT AS value
FROM assign GROUP BY split
UNION ALL
SELECT 'near_dup_groups', COUNT(DISTINCT group_key)::BIGINT
FROM assign WHERE group_key <> doc_id
UNION ALL
SELECT 'cross_split_pairs',
       COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 END), 0)::BIGINT
FROM pairs p JOIN assign a ON p.doc_a = a.doc_id
             JOIN assign b ON p.doc_b = b.doc_id
UNION ALL
SELECT 'cross_split_pairs_naive',
       COALESCE(SUM(CASE WHEN {_sql_split_case('p.doc_a')}
                          <> {_sql_split_case('p.doc_b')} THEN 1 END), 0)::BIGINT
FROM pairs p
"""


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing Data
# Mixtures Speeds Up Language Model Pretraining"). DoReMi proper learns
# domain weights by exponentiated-gradient updates on a proxy model's
# EXCESS LOSS per domain; this engine runs the one-step counting analog:
# the corpus-trained unigram LM (textops.unigram_perplexity — the engine's
# loss proxy) scores every document, domains aggregate to a token-weighted
# mean surprisal, and each domain's mixture weight is its baseline token
# share multiplied by its excess surprisal over the easiest domain —
# hardness-proportional reweighting, the direction of DoReMi's first
# multiplicative update, with the mixture_sample machinery turning the
# learned weights into per-domain keep rates against a global token budget.
#
# All integer fixed-point (the unigram gate's 1/16-bit surprisal), so
# Spark == DuckDB bit-exactly. int64 headroom: score = toks_src * excess_q4
# and weight_milli multiplies it by 1000, so the dial is
# T * 2^12 * 1000 < 2^63 (T < ~2 * 10^12 corpus tokens); past that compute
# the score over token-kilounits (toks_src div 2^10) — same weights to
# milli precision, 2^10 more headroom.
#
# Scale shape: unigram_perplexity's cost (one token census + scoring pass)
# + ONE doc_id join of the per-doc scores against the (doc_id, source) map
# + one groupBy over the DOMAIN space (tiny). The domain relation feeds the
# min / total crossJoins and the final select, so it is localCheckpoint'ed
# (reduced multi-consumer frame — the cheap side of the dedup-module rule).

DRM_BUDGET_PCT = 50        # global budget: half the corpus tokens
DRM_EXCESS_FLOOR_Q4 = 16   # +1 bit on every excess so no domain zeroes out


def doremi_weights(
    documents: DataFrame, budget_pct: int = DRM_BUDGET_PCT
) -> DataFrame:
    """(source, n_docs, toks_src, mean_surprisal_q4, excess_q4,
    weight_milli, target_tokens, rate_pm) — one row per domain: the
    token-weighted mean surprisal under the corpus unigram LM, its excess
    over the easiest domain (+1 bit floor), the hardness-x-share mixture
    weight in per-mille, and the keep rate that spends a budget_pct token
    budget by those weights (capped at 1000 — a domain under its target
    keeps everything)."""
    ppl = textops.unigram_perplexity(documents)
    dom = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("source").cast("string").alias("source"),
    )
    per_src = (
        ppl.join(dom, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("toks_src"),
            F.sum(F.col("n_tokens") * F.col("mean_surprisal_q4")).alias("_ws"),
        )
        .withColumn("mean_q4", F.expr("_ws div toks_src").cast("long"))
    )
    # domain-space-sized; feeds the min crossJoin, the total crossJoin and
    # the final select — checkpoint the reduced frame, not the corpus.
    per_src = per_src.localCheckpoint(eager=False)
    mn = per_src.agg(F.min("mean_q4").alias("_mn"))
    sc = per_src.crossJoin(mn).withColumn(
        "excess_q4",
        (F.col("mean_q4") - F.col("_mn") + DRM_EXCESS_FLOOR_Q4).cast("long"),
    ).withColumn("_score", F.expr("toks_src * excess_q4").cast("long"))
    tot = sc.agg(
        F.sum("_score").alias("_ts"), F.sum("toks_src").alias("_tt")
    )
    return (
        sc.crossJoin(tot)
        .withColumn(
            "weight_milli", F.expr("(_score * 1000) div _ts").cast("long")
        )
        .withColumn(
            "target_tokens",
            F.expr(
                f"(((_tt * {int(budget_pct)}) div 100) * weight_milli) div 1000"
            ).cast("long"),
        )
        .withColumn(
            "rate_pm",
            F.least(
                F.lit(1000).cast("long"),
                F.expr("(target_tokens * 1000) div toks_src"),
            ).cast("int"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("toks_src").cast("long").alias("toks_src"),
            F.col("mean_q4").alias("mean_surprisal_q4"),
            "excess_q4",
            "weight_milli",
            "target_tokens",
            "rate_pm",
        )
    )


def doremi_sample(
    documents: DataFrame, budget_pct: int = DRM_BUDGET_PCT
) -> DataFrame:
    """(doc_id, source, n_tokens, rate_pm) — the composition: documents cut
    by the LEARNED domain rates (doremi_weights) with the same nested md5
    per-mille bucket as mixture_sample (deterministic, retry-stable,
    raising the budget yields a superset).

    100 TB shape: doremi_weights' cost + a narrow join of the corpus
    against the domain-space-sized rate table (AQE broadcasts it at
    runtime — no hard hint) and a stateless filter."""
    rates = doremi_weights(documents, budget_pct).select("source", "rate_pm")
    doc_id = F.col("doc_id").cast("string")
    bucket = (
        webclean._hx(F.md5(F.concat(F.lit("drm|"), doc_id)), 1, 5) % 1000
    ).cast("int")
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    return (
        documents.select(
            doc_id.alias("doc_id"),
            F.col("source").cast("string").alias("source"),
            toks.alias("n_tokens"),
            bucket.alias("bucket_pm"),
        )
        .join(rates, "source")
        .filter(F.col("bucket_pm") < F.col("rate_pm"))
        .select("doc_id", "source", "n_tokens", "rate_pm")
    )


def _sql_doremi_weights_body(table: str, budget_pct: int) -> str:
    return f"""
ppl AS ({textops.sql_unigram_perplexity(table)}),
dom AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(source AS VARCHAR) AS source
  FROM {table}
),
per_src AS (
  SELECT source,
         COUNT(*)::BIGINT AS n_docs,
         SUM(n_tokens)::BIGINT AS toks_src,
         ((SUM(n_tokens * mean_surprisal_q4)::BIGINT)
          // SUM(n_tokens)::BIGINT)::BIGINT AS mean_q4
  FROM ppl JOIN dom USING (doc_id) GROUP BY source
),
mn AS (SELECT MIN(mean_q4) AS mnv FROM per_src),
sc AS (
  SELECT per_src.*,
         (mean_q4 - mn.mnv + {DRM_EXCESS_FLOOR_Q4})::BIGINT AS excess_q4,
         (toks_src * (mean_q4 - mn.mnv + {DRM_EXCESS_FLOOR_Q4}))::BIGINT AS score
  FROM per_src CROSS JOIN mn
),
tot AS (SELECT SUM(score)::BIGINT AS ts, SUM(toks_src)::BIGINT AS tt FROM sc),
wts AS (
  SELECT source, n_docs, toks_src, mean_q4 AS mean_surprisal_q4, excess_q4,
         ((score * 1000) // ts)::BIGINT AS weight_milli,
         ((((tt * {int(budget_pct)}) // 100) * ((score * 1000) // ts))
          // 1000)::BIGINT AS target_tokens,
         CAST(least(1000,
              (((((tt * {int(budget_pct)}) // 100) * ((score * 1000) // ts))
                // 1000) * 1000) // toks_src) AS INT) AS rate_pm
  FROM sc CROSS JOIN tot
)"""


def sql_doremi_weights(
    table: str = "documents", budget_pct: int = DRM_BUDGET_PCT
) -> str:
    return f"""
WITH {_sql_doremi_weights_body(table, budget_pct)}
SELECT * FROM wts
"""


def sql_doremi_sample(
    table: str = "documents", budget_pct: int = DRM_BUDGET_PCT
) -> str:
    return f"""
WITH {_sql_doremi_weights_body(table, budget_pct)}
SELECT d.doc_id, d.source, d.n_tokens, wts.rate_pm
FROM (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(source AS VARCHAR) AS source,
         CAST(length(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5('drm|' || CAST(doc_id AS VARCHAR)), 1, 5))::BIGINT
              % 1000 AS INT) AS bucket_pm
  FROM {table}
) d
JOIN wts USING (source)
WHERE d.bucket_pm < wts.rate_pm
"""


# ---------------------------------------------------------------------------
# Quality-annealed curriculum schedule (Bengio et al. 2009 curriculum
# learning, CCNet's head/middle/tail as the difficulty axis): epoch 0
# trains on the fluent head only, epoch 1 admits the middle, epoch 2 the
# tail — easy-first annealing with the corpus's own LM-perplexity terciles
# as the difficulty score. (The reverse "anti-curriculum" is the same
# relation read epoch-descending; the schedule relation is direction-
# agnostic.) Each (doc, epoch) row carries the epoch-salted shard/pos of
# webclean.epoch_shuffle, so the output IS the training order: one sorted
# shard file per (epoch, shard) is exactly what a loader reads.
#
# Scale shape: ppl_buckets' cost (LM pass + bounded histogram) + an
# explode over <= CURR_EPOCHS epoch ids + ONE shuffle onto the
# (epoch, shard) key for the per-shard rank — never a global sort; shard
# sizes stay md5-uniform inside each epoch.

CURR_EPOCHS = 3
_CURR_RANK = {"head": 0, "middle": 1, "tail": 2}


def curriculum_schedule(
    documents: DataFrame,
    n_epochs: int = CURR_EPOCHS,
    n_shards: int = webclean.SHUF_SHARDS,
) -> DataFrame:
    """(doc_id, ppl_bucket, epoch, shard, pos) — one row per (doc, epoch)
    the annealed schedule admits: a doc enters at the epoch matching its
    tercile rank (head 0, middle 1, tail 2) and stays for every later
    epoch; shard/pos are the epoch-salted md5 order within the epoch."""
    from pyspark.sql import Window

    buckets = textops.ppl_buckets(documents).select("doc_id", "ppl_bucket")
    enter = (
        F.when(F.col("ppl_bucket") == "head", F.lit(0))
        .when(F.col("ppl_bucket") == "middle", F.lit(1))
        .otherwise(F.lit(2))
    )
    admitted = buckets.select(
        "doc_id",
        "ppl_bucket",
        F.explode(
            F.sequence(enter, F.lit(int(n_epochs) - 1))
        ).alias("epoch"),
    )
    h = F.md5(
        F.concat(
            F.lit("curr|"),
            F.col("epoch").cast("string"),
            F.lit("|"),
            F.col("doc_id"),
        )
    )
    base = admitted.select(
        "doc_id",
        "ppl_bucket",
        "epoch",
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards)
        .cast("int")
        .alias("shard"),
        h.alias("_h"),
    )
    win = Window.partitionBy("epoch", "shard").orderBy("_h", "doc_id")
    return base.select(
        "doc_id",
        "ppl_bucket",
        F.col("epoch").cast("int").alias("epoch"),
        "shard",
        F.row_number().over(win).cast("int").alias("pos"),
    )


def sql_curriculum_schedule(
    table: str = "documents",
    n_epochs: int = CURR_EPOCHS,
    n_shards: int = webclean.SHUF_SHARDS,
) -> str:
    h = "md5('curr|' || CAST(epoch AS VARCHAR) || '|' || doc_id)"
    return f"""
WITH buckets AS (
  SELECT doc_id, ppl_bucket FROM ({textops.sql_ppl_buckets(table)})
),
admitted AS (
  SELECT doc_id, ppl_bucket, unnest(range(
           CASE ppl_bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1 ELSE 2 END,
           {int(n_epochs)})) AS epoch
  FROM buckets
),
keyed AS (
  SELECT doc_id, ppl_bucket, epoch,
         CAST((('0x' || substr({h}, 1, 4))::BIGINT % {int(n_shards)}) AS INT) AS shard,
         {h} AS _h
  FROM admitted
)
SELECT doc_id, ppl_bucket, CAST(epoch AS INT) AS epoch, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY _h, doc_id)
            AS INT) AS pos
FROM keyed
"""


# ------------------------------------------------- UniMax language sampling
# UniMax (Chung et al. 2023): given a total token budget and a per-language
# epoch cap, walk languages LOW-resource first; each gets
# min(cap * n_lang, remaining_budget / remaining_languages) and the
# leftover WATER-FILLS into the higher-resource languages. This is the
# redistributing complement of packing.budget_plan (which clamps and
# REPORTS shortfall, never redistributes) and the closed-form alternative
# to webclean.temperature_mixture's alpha dial: no temperature to tune,
# the cap is the only knob, and no language exceeds it.
#
# Scale shape: ONE language census shuffle (map-side combine). The
# water-filling walk is inherently sequential over languages — a BOUNDED
# domain (ISO-language-sized at any corpus scale) — so it runs as ONE
# in-row SQL `aggregate` fold over the ascending-sorted census array in a
# single-row frame (the partition_audit idiom), never over docs. The rate
# table joins back onto the corpus (language-sized, AQE broadcasts it)
# and ONE final language groupBy censuses what the md5 residual coin
# kept. All arithmetic is int64 integer division, bit-exact vs the DuckDB
# recursive-CTE replay of the same walk.

UNIMAX_BUDGET_X = 2   # budget = 2x the corpus tokens
UNIMAX_EPOCH_CAP = 3  # no language repeats more than 3 epochs


def unimax_sample(
    documents: DataFrame,
    budget_x: int = UNIMAX_BUDGET_X,
    epoch_cap: int = UNIMAX_EPOCH_CAP,
) -> DataFrame:
    """(lang, n_docs, n_tokens, alloc_tokens, epochs_milli, capped,
    full_epochs, residual_pm, kept_docs, kept_tokens, sampled_docs) — the
    UniMax allocation per language plus what the sampling schedule
    (full_epochs whole passes + an md5 residual coin) actually selects.
    `capped` marks languages whose epoch cap was the binding minimum."""
    doc_id = F.col("doc_id").cast("string")
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    census = (
        documents.select(F.col("lang").cast("string").alias("lang"), toks.alias("t"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("t").alias("n_tokens"),
        )
    )
    census = census.localCheckpoint(eager=False)  # lang-sized, 2 consumers
    folded = census.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("n_tokens"), F.col("lang")))
        ).alias("cs"),
        F.sum("n_tokens").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nl"),
    )
    # the whole walk as one SQL fold; `alloc` has no let-binding in SQL
    # lambdas so the min() is written twice — the fold runs once per
    # LANGUAGE, not per row, so the repetition is free
    alloc_expr = f"least({epoch_cap} * x.n_tokens, acc.b_rem div acc.l_rem)"
    allocs = folded.select(
        F.explode(
            F.expr(
                f"""aggregate(
  cs,
  struct(cast(_total * {budget_x} as bigint) as b_rem,
         cast(_nl as bigint) as l_rem,
         cast(array() as array<struct<lang:string,alloc:bigint>>) as allocs),
  (acc, x) -> struct(
      acc.b_rem - {alloc_expr} as b_rem,
      acc.l_rem - 1 as l_rem,
      array_append(acc.allocs,
                   struct(x.lang as lang, {alloc_expr} as alloc)) as allocs),
  acc -> acc.allocs)"""
            )
        ).alias("a")
    ).select(F.col("a.lang").alias("lang"), F.col("a.alloc").alias("alloc_tokens"))
    rates = census.join(allocs, "lang").select(
        "lang",
        "n_docs",
        "n_tokens",
        "alloc_tokens",
        F.expr("(1000 * alloc_tokens) div n_tokens").cast("long").alias(
            "epochs_milli"
        ),
        (F.col("alloc_tokens") == F.lit(epoch_cap).cast("long") * F.col("n_tokens")).alias(
            "capped"
        ),
        F.expr("alloc_tokens div n_tokens").cast("long").alias("full_epochs"),
        F.expr("((alloc_tokens % n_tokens) * 1000) div n_tokens").cast("long").alias(
            "residual_pm"
        ),
    )
    coin = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ux|"), doc_id)), 1, 5), 16, 10)
        .cast("long") % 1000
    )
    kept = (
        documents.select(
            F.col("lang").cast("string").alias("lang"),
            toks.alias("t"),
            coin.alias("c"),
        )
        .join(rates.select("lang", "residual_pm"), "lang")
        .filter(F.col("c") < F.col("residual_pm"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("t").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "alloc_tokens",
            "epochs_milli",
            "capped",
            "full_epochs",
            "residual_pm",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            (
                F.col("full_epochs") * F.col("n_docs")
                + F.coalesce("kept_docs", F.lit(0))
            ).cast("long").alias("sampled_docs"),
        )
        .orderBy("lang")
    )


def sql_unimax_sample(
    table: str = "documents",
    budget_x: int = UNIMAX_BUDGET_X,
    epoch_cap: int = UNIMAX_EPOCH_CAP,
) -> str:
    """DuckDB mirror: identical census; the water-filling walk replayed as
    a recursive CTE over the ascending language rank carrying
    (b_rem, l_rem); identical residual coin and kept census."""
    return f"""
WITH RECURSIVE census AS (
  SELECT CAST(lang AS VARCHAR) AS lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM {table} GROUP BY 1
),
ranked AS (
  SELECT lang, n_docs, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens ASC, lang ASC) AS rk
  FROM census
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS nl
  FROM census
),
walk AS (
  SELECT 0::BIGINT AS rk, (total * {budget_x})::BIGINT AS b_rem,
         nl AS l_rem, NULL::VARCHAR AS lang, 0::BIGINT AS alloc
  FROM tot
  UNION ALL
  SELECT r.rk,
         w.b_rem - LEAST({epoch_cap} * r.n_tokens, w.b_rem // w.l_rem),
         w.l_rem - 1,
         r.lang,
         LEAST({epoch_cap} * r.n_tokens, w.b_rem // w.l_rem)
  FROM walk w JOIN ranked r ON r.rk = w.rk + 1
),
rates AS (
  SELECT c.lang, c.n_docs, c.n_tokens,
         w.alloc AS alloc_tokens,
         (1000 * w.alloc) // c.n_tokens AS epochs_milli,
         (w.alloc = {epoch_cap} * c.n_tokens) AS capped,
         w.alloc // c.n_tokens AS full_epochs,
         ((w.alloc % c.n_tokens) * 1000) // c.n_tokens AS residual_pm
  FROM census c JOIN walk w ON c.lang = w.lang
),
kept AS (
  SELECT CAST(d.lang AS VARCHAR) AS lang,
         CAST(COUNT(*) AS BIGINT) AS kept_docs,
         CAST(SUM(len(list_filter(string_split(d.text, ' '), x -> x <> '')))
              AS BIGINT) AS kept_tokens
  FROM {table} d
  JOIN rates r ON CAST(d.lang AS VARCHAR) = r.lang
  WHERE ('0x' || substr(md5('ux|' || CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
          % 1000 < r.residual_pm
  GROUP BY 1
)
SELECT r.lang, r.n_docs, r.n_tokens, r.alloc_tokens, r.epochs_milli,
       r.capped, r.full_epochs, r.residual_pm,
       COALESCE(k.kept_docs, 0)::BIGINT AS kept_docs,
       COALESCE(k.kept_tokens, 0)::BIGINT AS kept_tokens,
       (r.full_epochs * r.n_docs + COALESCE(k.kept_docs, 0))::BIGINT
         AS sampled_docs
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
ORDER BY r.lang
"""


# ---------------------------------------------------- per-source data card
# The dataset-documentation relation (Datasheets for Datasets / the data
# card every corpus release ships): one row per source with volume, a
# within-source exact-duplicate rate, the language mix (count + Shannon
# entropy), a quality score, and the median document length. Each signal
# exists as its own operator; the card is the composed one-pass release
# artifact — the first table a consumer of the corpus reads, and the
# regression surface a weekly crawl diffs against corpus_drift_report.
#
# Scale shape: one narrow doc Project feeds four censuses — (source)
# volume+quality, (source, text-hash) dup census (the dedup_exact shuffle
# keyed WITH source), (source, lang) mix, (source, n_tokens) length
# histogram — all but the dup census on bounded key spaces. The median is
# the histogram-cumsum idiom partitioned BY SOURCE (never a global sort);
# entropy is the 1/16-bit integer log2 kernel (s16), bit-exact vs DuckDB.

DC_PRESCALE = 1024  # s16's LM_PRESCALE, re-declared for the entropy ratio


def datacard(documents: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens, tokens_p50, dup_milli, n_langs,
    lang_entropy_q4, mean_flesch_milli) — the per-source data card.
    lang_entropy_q4 is Shannon entropy over the source's language doc
    distribution in 1/16-bit units; dup_milli is the within-source
    exact-duplicate share (docs minus distinct texts)."""
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    w, s, y = textops.readability_counts(F.col("text"))
    f = F.greatest(F.lit(0).cast("long"), textops.flesch_milli(w, s, y))
    base = documents.select(
        F.col("source").cast("string").alias("source"),
        F.col("lang").cast("string").alias("lang"),
        toks.alias("t"),
        f.alias("f"),
        F.md5(F.col("text")).alias("h"),
    )
    vol = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("t").alias("n_tokens"),
        F.sum("f").alias("_fsum"),
    )
    dup = (
        base.groupBy("source", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").alias("_docs"),
            F.count(F.lit(1)).cast("long").alias("_distinct"),
        )
        .select(
            "source",
            F.expr("(1000 * (_docs - _distinct)) div _docs").cast("long").alias(
                "dup_milli"
            ),
        )
    )
    lg = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    )
    lang = (
        lg.join(vol.select("source", "n_docs"), "source")
        .withColumn("_lm_q", F.expr(f"(n_docs * {DC_PRESCALE}) div n_l"))
        .withColumn("_s16", textops._surprisal16(None))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.expr("sum(n_l * _s16)").alias("_esum"),
            F.max("n_docs").alias("_nd"),
        )
        .select(
            "source",
            "n_langs",
            F.expr("_esum div _nd").cast("long").alias("lang_entropy_q4"),
        )
    )
    from pyspark.sql import Window

    hist = base.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = Window.partitionBy("source").orderBy("t")
    p50 = (
        hist.withColumn("_cum", F.sum("c").over(wcum))
        .join(vol.select("source", "n_docs"), "source")
        .filter(F.col("_cum") * 2 >= F.col("n_docs"))
        .groupBy("source")
        .agg(F.min("t").alias("tokens_p50"))
    )
    return (
        vol.join(dup, "source")
        .join(lang, "source")
        .join(p50, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "tokens_p50",
            "dup_milli",
            "n_langs",
            "lang_entropy_q4",
            F.expr("_fsum div n_docs").cast("long").alias("mean_flesch_milli"),
        )
        .orderBy("source")
    )


def sql_datacard(table: str = "documents") -> str:
    """DuckDB mirror: identical censuses, histogram-cumsum median, s16
    entropy kernel, and flesch weighting."""
    from .textops import LM_PRESCALE

    bias = 16 + 16 * (LM_PRESCALE.bit_length() - 1)
    wexpr = "GREATEST(1, len(string_split(text, ' ')))"
    sexpr = (
        "GREATEST(1, len(text) - len(regexp_replace(text, '[.!?]', '', 'g')))"
    )
    yexpr = (
        "GREATEST(1, len(string_split_regex(lower(text), '[aeiou]+')) - 1)"
    )
    fexpr = (
        f"GREATEST(0::BIGINT, 206835 - (1015 * {wexpr}) // {sexpr}"
        f" - (84600 * {yexpr}) // {wexpr})"
    )
    return f"""
WITH base AS (
  SELECT CAST(source AS VARCHAR) AS source, CAST(lang AS VARCHAR) AS lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS t,
         {fexpr} AS f,
         md5(text) AS h
  FROM {table}
),
vol AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(t)::BIGINT AS n_tokens,
         SUM(f)::BIGINT AS fsum
  FROM base GROUP BY source
),
dup AS (
  SELECT source,
         ((1000 * (SUM(c) - COUNT(*))) // SUM(c))::BIGINT AS dup_milli
  FROM (SELECT source, h, COUNT(*)::BIGINT AS c FROM base GROUP BY 1, 2)
  GROUP BY source
),
lg AS (SELECT source, lang, COUNT(*)::BIGINT AS n_l FROM base GROUP BY 1, 2),
lang AS (
  SELECT lg.source,
         COUNT(*)::BIGINT AS n_langs,
         (SUM(n_l * (16 * (length(bin(q)) - 1)
                     + ((q * 16) >> (length(bin(q)) - 1)) - {bias}))
          // MAX(v.n_docs))::BIGINT AS lang_entropy_q4
  FROM (SELECT source, lang, n_l,
               ((SELECT n_docs FROM vol WHERE vol.source = lg0.source)
                * {DC_PRESCALE}) // n_l AS q
        FROM lg AS lg0) lg
  JOIN vol v ON lg.source = v.source
  GROUP BY lg.source
),
hist AS (SELECT source, t, COUNT(*)::BIGINT AS c FROM base GROUP BY 1, 2),
p50 AS (
  SELECT source, MIN(t)::BIGINT AS tokens_p50
  FROM (
    SELECT h.source, h.t,
           SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.t) AS cum,
           v.n_docs
    FROM hist h JOIN vol v ON h.source = v.source
  ) WHERE cum * 2 >= n_docs
  GROUP BY source
)
SELECT v.source, v.n_docs, v.n_tokens, p.tokens_p50, d.dup_milli,
       l.n_langs, l.lang_entropy_q4,
       (v.fsum // v.n_docs)::BIGINT AS mean_flesch_milli
FROM vol v JOIN dup d ON v.source = d.source
JOIN lang l ON v.source = l.source
JOIN p50 p ON v.source = p.source
ORDER BY v.source
"""


def synthesize_datacard_corpus(documents: DataFrame) -> DataFrame:
    """documents plus an md5-selected ~1/8 of docs re-keyed as
    'd'||doc_id with identical (text, lang, source) — planted exact
    duplicates so the card's dup_milli column exercises in the gate
    (the curation-keeper plant idiom; the fixture itself carries none)."""
    doc_id = F.col("doc_id").cast("string")
    base = documents.select(
        doc_id.alias("doc_id"), "text", "lang", "source"
    )
    plant = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dcp|"), doc_id)), 1, 4), 16, 10)
        .cast("long") % 8 == 0
    )
    return base.unionByName(
        base.filter(plant).select(
            F.concat(F.lit("d"), F.col("doc_id")).alias("doc_id"),
            "text", "lang", "source",
        )
    )


def sql_synthesize_datacard_corpus(table: str = "documents") -> str:
    """DuckDB mirror of synthesize_datacard_corpus (FROM-able subquery)."""
    plant = (
        "(('0x' || substr(md5('dcp|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT"
        " % 8) = 0"
    )
    return f"""
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, lang, source FROM {table}
  UNION ALL
  SELECT 'd' || CAST(doc_id AS VARCHAR), text, lang, source
  FROM {table} WHERE {plant}
"""


# ----------------------------------------------------- filter-funnel report
# Per-gate kill attribution over the curation chain — the ablation table
# every curation paper publishes (C4 §2.2, Gopher table A1, RefinedWeb
# fig. 2): for each gate, how many documents it rejects outright, how many
# ONLY it rejects (its unique contribution — the number that justifies the
# gate's existence), and how many documents survive the chain up to and
# including it in pipeline order. Unique-kill vs total-kill separates
# redundant gates (high overlap with earlier, cheaper rules) from
# load-bearing ones.

FUNNEL_GATES = ("quality", "perplexity", "dedup", "sample")


def filter_funnel(
    documents: DataFrame,
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> DataFrame:
    """(stage, gate, n_fail, n_unique_fail, n_survive, fail_pm) — one row
    per curation gate in pipeline order.

    Scale shape: the cost IS the curation flag relation (one traversal of
    the corpus, see _curation_frame); the funnel itself is ONE global
    aggregate of conditional sums (map-side partials collapse to a single
    row regardless of corpus size) followed by an in-row explode of 4
    constant structs — no added shuffle shape, constant-size output at any
    corpus size. n_survive is cumulative (gates 1..i all pass), so the
    last row's n_survive equals the keep count of curation_flags."""
    flags = curation_flags(documents, min_df, cap, sample_pct)
    passes = [
        F.col("ok_quality"),
        ~F.col("ppx_flag"),
        F.col("is_keeper"),
        F.col("sampled"),
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("total")]
    for i, p in enumerate(passes):
        others = [q for j, q in enumerate(passes) if j != i]
        only_this = ~p & others[0] & others[1] & others[2]
        cum = passes[0]
        for j in range(1, i + 1):
            cum = cum & passes[j]
        aggs += [
            F.sum((~p).cast("long")).alias(f"f{i}"),
            F.sum(only_this.cast("long")).alias(f"u{i}"),
            F.sum(cum.cast("long")).alias(f"s{i}"),
        ]
    one = flags.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(name).alias("gate"),
                F.col(f"f{i}").alias("n_fail"),
                F.col(f"u{i}").alias("n_unique_fail"),
                F.col(f"s{i}").alias("n_survive"),
            )
            for i, name in enumerate(FUNNEL_GATES)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"), "total")
        .select(
            "r.stage",
            "r.gate",
            "r.n_fail",
            "r.n_unique_fail",
            "r.n_survive",
            F.expr("(1000 * r.n_fail) div total").cast("long").alias("fail_pm"),
        )
        .orderBy("stage")
    )


def sql_filter_funnel(
    table: str = "documents",
    min_df: int = webclean.MIN_DF,
    cap: int = webclean.CAP,
    sample_pct: int = CURATION_SAMPLE_PCT,
) -> str:
    """DuckDB mirror of filter_funnel (shares _sql_flagged_body)."""
    passes = [
        "ok_quality",
        "(NOT ppx_flag)",
        "is_keeper",
        "sampled",
    ]
    cells = ["CAST(COUNT(*) AS BIGINT) AS total"]
    for i, p in enumerate(passes):
        others = [q for j, q in enumerate(passes) if j != i]
        only_this = f"(NOT {p}) AND {others[0]} AND {others[1]} AND {others[2]}"
        cum = " AND ".join(passes[: i + 1])
        cells += [
            f"CAST(COUNT(*) FILTER (WHERE NOT {p}) AS BIGINT) AS f{i}",
            f"CAST(COUNT(*) FILTER (WHERE {only_this}) AS BIGINT) AS u{i}",
            f"CAST(COUNT(*) FILTER (WHERE {cum}) AS BIGINT) AS s{i}",
        ]
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS stage, '{name}' AS gate,"
        f" f{i} AS n_fail, u{i} AS n_unique_fail, s{i} AS n_survive,"
        f" CAST((1000 * f{i}) // total AS BIGINT) AS fail_pm FROM agg"
        for i, name in enumerate(FUNNEL_GATES)
    )
    return f"""
WITH {_sql_flagged_body(table, min_df, cap, sample_pct)},
agg AS (SELECT {', '.join(cells)} FROM flagged)
{rows}
ORDER BY stage
"""


# ------------------------------------------------- source vocabulary overlap
SRC_TOPK = 64  # per-source head-vocabulary size (the broadcast-safe cap)


def source_overlap(documents: DataFrame, topk: int = SRC_TOPK) -> DataFrame:
    """(source_a, source_b, shared, jaccard_milli) — head-vocabulary
    Jaccard between every source pair: the 'does the new source add
    anything' acquisition relation (near-1000 overlap with an existing
    source = paying twice for the same distribution; datacard's volume
    columns say how MUCH a source brings, this says how NEW it is).

    100 TB shape: ONE (source, token) census with map-side partials, a
    per-source top-K trim planned through WindowGroupLimit (map-side
    partial top-K BEFORE the exchange — the domain_cap kernel), then the
    pair join runs on |sources| * topk rows — bounded regardless of corpus
    size. Ties at the count boundary break by token asc, so the head set
    is deterministic in both engines."""
    toks = documents.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    census = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    head = (
        census.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= topk)
        .select("source", "token")
    )
    a = head.select(F.col("source").alias("source_a"), "token")
    b = head.select(F.col("source").alias("source_b"), "token")
    shared = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sizes = head.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        shared.join(
            sizes.withColumnRenamed("source", "source_a").withColumnRenamed(
                "n", "na"
            ),
            "source_a",
        )
        .join(
            sizes.withColumnRenamed("source", "source_b").withColumnRenamed(
                "n", "nb"
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared",
            F.expr("(1000 * shared) div (na + nb - shared)")
            .cast("long")
            .alias("jaccard_milli"),
        )
        .orderBy("source_a", "source_b")
    )


def sql_source_overlap(table: str = "documents", topk: int = SRC_TOPK) -> str:
    """DuckDB mirror of source_overlap."""
    return f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
           AS token
  FROM {table}
),
census AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, token
),
head AS (
  SELECT source, token FROM (
    SELECT source, token,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY c DESC, token ASC) AS r
    FROM census
  ) WHERE r <= {topk}
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM head GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM head a JOIN head b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.shared,
       CAST((1000 * s.shared) // (sa.n + sb.n - s.shared) AS BIGINT)
         AS jaccard_milli
FROM shared s
JOIN sizes sa ON sa.source = s.source_a
JOIN sizes sb ON sb.source = s.source_b
ORDER BY source_a, source_b
"""
