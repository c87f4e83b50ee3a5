"""Query registry for the driver contract (__spark_entry__).

Each entry is a callable (spark, sf_dir) -> DataFrame plus (where the
computation is SQL-expressible) an equivalent ANSI-SQL string DuckDB runs on
the same parquet tables. Column names and rounding are aligned on both sides
because the driver hash-compares values per column name.

Coverage map (SURVEY.md §2.6 relational checklist + training-data ops):
- projections/filters, joins (broadcast dim), aggregations, windows,
  sorts/top-k, distinct — the native-operator surface the engine relies on
- text analysis, fingerprint/dedup, similarity over the documents/embeddings
  tables — the large-scale training-data operations
- extraction-engine queries (media preservation, char conservation) that run
  the FULL per-doc pipeline and are still DuckDB-checkable end-to-end
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import (
    bpe,
    clustering,
    curation,
    decontam,
    dedup,
    graphops,
    htmlops,
    multimodal,
    packing,
    retrieval,
    similarity,
    sketches,
    textops,
    webclean,
)
from .operators import serialize
from .operators.extract import extract_spans
from .sources.adapters import documents_to_interleaved

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- relational

def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                              AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                         AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                              AS avg_qty,
       COUNT(*)                                               AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def q_join_revenue_by_nation(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("n_name")
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_filter_high_value(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") >= 0.05) & (F.col("l_quantity") > 25))
        .select("l_orderkey", "l_partkey", F.round(F.col("l_extendedprice"), 2).alias("price"))
    )


SQL_FILTER_HIGH_VALUE = """
SELECT l_orderkey, l_partkey, ROUND(l_extendedprice, 2) AS price
FROM lineitem WHERE l_discount >= 0.05 AND l_quantity > 25
"""


def q_topk_customers(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"), F.count(F.lit(1)).alias("n_orders"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


SQL_TOPK_CUSTOMERS = """
SELECT c_custkey, c_name, total_spent, n_orders
FROM (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spent, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey) t
JOIN customer ON o_custkey = c_custkey
ORDER BY total_spent DESC, c_custkey LIMIT 10
"""


def q_window_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_over = (F.col("ts") - prev_ts) > F.expr("INTERVAL 1800 SECONDS")
    return (
        ev.withColumn("new_session", F.when(prev_ts.isNull() | gap_over, 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


SQL_WINDOW_SESSIONIZE = """
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM (
  SELECT user_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 1800 SECOND
                   OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events) t
GROUP BY user_id ORDER BY user_id
"""


def q_distinct_event_types(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


SQL_DISTINCT_EVENT_TYPES = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------------------- text analysis

def q_text_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


SQL_TEXT_TOKEN_COUNT = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars
FROM documents
"""


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        F.round(stop_hits / F.size(words), 4).alias("stopword_ratio"),
        F.round(F.length(F.regexp_replace("text", "[^ ]", "")) / F.length("text"), 4).alias("space_ratio"),
        F.size(F.array_distinct(words)).alias("n_unique_tokens"),
    )


SQL_TEXT_QUALITY = f"""
SELECT doc_id,
       ROUND(len(list_filter(string_split(text, ' '), w -> w IN {STOPWORDS!r}))
             / len(string_split(text, ' ')), 4)  AS stopword_ratio,
       ROUND((length(text) - length(replace(text, ' ', ''))) * 1.0 / length(text), 4) AS space_ratio,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens
FROM documents
""".replace("'", "'")


def q_text_quality_rules(spark, sf_dir):
    """Gopher-style document quality gates, all native columns: word-count
    bounds, mean word length band, symbol-to-word ratio, digit-word fraction,
    minimum stopword hits. `keep` is the conjunctive verdict a training-data
    filter acts on; the component flags make rejects auditable."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_wlen = F.round(
        F.length(F.regexp_replace("text", " ", "")) / n_words, 4
    )
    digit_words = F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ok_count = (n_words >= 5) & (n_words <= 100000)
    ok_wlen = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    ok_digits = (digit_words / n_words) <= 0.3
    ok_stops = stop_hits >= 1
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        F.round(digit_words / n_words, 4).alias("digit_word_ratio"),
        stop_hits.cast("int").alias("stopword_hits"),
        (ok_count & ok_wlen & ok_digits & ok_stops).alias("keep"),
    )


SQL_TEXT_QUALITY_RULES = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       ROUND(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 4)
         AS mean_word_len,
       ROUND(len(list_filter(string_split(text, ' '), w -> regexp_full_match(w, '[0-9]+')))
             * 1.0 / len(string_split(text, ' ')), 4) AS digit_word_ratio,
       CAST(len(list_filter(string_split(text, ' '), w -> w IN {STOPWORDS!r})) AS INT)
         AS stopword_hits,
       (len(string_split(text, ' ')) BETWEEN 5 AND 100000)
         AND (ROUND(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 4)
              BETWEEN 2.0 AND 12.0)
         AND (len(list_filter(string_split(text, ' '), w -> regexp_full_match(w, '[0-9]+')))
              * 1.0 / len(string_split(text, ' ')) <= 0.3)
         AND (len(list_filter(string_split(text, ' '), w -> w IN {STOPWORDS!r})) >= 1)
         AS keep
FROM documents
"""


def q_text_vocabulary(spark, sf_dir):
    """Corpus vocabulary: top-100 tokens by frequency with document
    frequency — the vocab-building pass of a tokenizer-training pipeline.
    One explode + one groupBy shuffle; deterministic order (count desc,
    token asc) so the LIMIT boundary is engine-independent."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )


SQL_TEXT_VOCABULARY = """
SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token ASC LIMIT 100
"""


def q_text_length_quantiles(spark, sf_dir):
    """Exact p50/p90/p99 of document char length, computed scale-shaped:
    histogram groupBy (one shuffle over |distinct lengths| keys) + cumulative
    sum over the small distinct-value domain, then smallest value whose
    cumulative count reaches ceil(p*N). No global row sort, no
    approx-percentile nondeterminism — exact and engine-independent."""
    docs = _t(spark, sf_dir, "documents")
    hist = docs.groupBy(F.length("text").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # BOUNDED single-partition window: its input is the histogram, whose row
    # count is |distinct lengths| <= max doc length (a few thousand), NOT the
    # corpus. Copying this pattern onto an unbounded domain funnels the whole
    # dataset through one task — tests/test_scale_lint.py flags any new
    # Window without partitionBy for exactly that reason (allowlisted here).
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "v", F.sum("c").over(w).alias("cum"), F.sum("c").over(wt).alias("total")
    )
    out = None
    for p in (50, 90, 99):
        need = F.ceil(F.col("total") * F.lit(p) / F.lit(100.0))
        sel = (
            cum.filter(F.col("cum") >= need)
            .agg(F.min("v").alias("n_chars"))
            .select(F.lit(p).alias("p"), "n_chars")
        )
        out = sel if out is None else out.unionByName(sel)
    return out


SQL_TEXT_LENGTH_QUANTILES = """
WITH hist AS (
  SELECT length(text) AS v, COUNT(*) AS c FROM documents GROUP BY 1
),
cum AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS total FROM hist
)
SELECT p, MIN(v) AS n_chars
FROM cum, (VALUES (50), (90), (99)) t(p)
WHERE cum >= ceil(total * p / 100.0)
GROUP BY p
"""


def q_text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )


SQL_TEXT_FINGERPRINT = """
SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
"""


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("fingerprint", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(lower(trim(text))) AS fingerprint, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# ------------------------------------ dedup / similarity / multimodal (§2+)

def q_dedup_weighted_sample(spark, sf_dir):
    """Duplicate-aware weighted sampling ("soft dedup"): keep ONE copy per
    exact-content cluster and upweight its keep probability by the cluster
    size, so naturally-replicated content keeps frequency-proportional
    influence without token repetition. One census shuffle; the coin is a
    pure function of the content hash (whole cluster, one draw). Duplicate
    structure is planted (the fixture's texts are unique), rebuilt
    identically by the oracle."""
    return dedup.dup_weighted_sample(
        dedup.synthesize_dup_corpus(_t(spark, sf_dir, "documents"))
    )


def q_dedup_incremental(spark, sf_dir):
    """Incremental (new-batch-vs-history) exact dedup — the production
    shape where history is never re-deduped: the day's crawl anti-joins its
    fingerprints against the kept corpus (shuffle join, never broadcast —
    history IS the corpus), then in-batch ties break to the smallest doc_id."""
    return dedup.incremental_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))


def q_dedup_components(spark, sf_dir):
    """Keeper selection: connected components over the MinHash-LSH near-dup
    pairs — (doc_id, rep) with rep = the kept representative."""
    pairs = dedup.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))
    return dedup.connected_components(pairs)


def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


def q_dedup_simhash_neardup(spark, sf_dir):
    return dedup.simhash_neardups(_t(spark, sf_dir, "documents"))


def q_dedup_simhash_hot_buckets(spark, sf_dir):
    """No-silent-caps surface: buckets simhash_neardups trimmed (usually 0
    rows at fixture scale; a boilerplate-heavy corpus populates it)."""
    return dedup.simhash_oversized_buckets(_t(spark, sf_dir, "documents"))


def q_sim_ann_hot_buckets(spark, sf_dir):
    """No-silent-caps surface for the ANN pair miner."""
    return similarity.ann_oversized_buckets(_t(spark, sf_dir, "embeddings"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


def q_sim_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_t(spark, sf_dir, "embeddings"))


def q_sim_ann_lsh(spark, sf_dir):
    return similarity.ann_lsh_pairs(_t(spark, sf_dir, "embeddings"))


def q_sim_ivf_topk(spark, sf_dir):
    return similarity.ivf_topk(_t(spark, sf_dir, "embeddings"))


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-shaped keeper selection: embedding-level near-dup clusters
    (ann_lsh_pairs at cos >= 0.9 over the planted-duplicate corpus) ->
    connected components -> keeper = cluster representative."""
    return similarity.semantic_dedup(_t(spark, sf_dir, "embeddings"))


def q_dedup_semdedup(spark, sf_dir):
    """SemDeDup proper (Abbas et al. 2023): k-means partition of the
    embedding space, exact within-cluster cosine near-dup pairs, then
    connected-components keeper — the quadratic pair search confined to one
    cluster at a time (the paper's scale trick), vs dedup_semantic's
    hyperplane-LSH candidate generator over the same planted corpus.
    Cluster width is bounded: over-cap clusters get a hyperplane
    sub-refinement and still-over-cap buckets are dropped + reported via
    dedup_semdedup_hot (the SEM_MAX_CLUSTER contract)."""
    return similarity.semdedup_kmeans(_t(spark, sf_dir, "embeddings"))


def q_dedup_semdedup_hot(spark, sf_dir):
    """No-silent-caps surface for semdedup_kmeans: (cluster, sub) buckets
    still wider than SEM_MAX_CLUSTER after hyperplane refinement, whose
    pairs the join skipped (usually 0 rows at fixture scale; a
    template-duplication-degenerate corpus populates it)."""
    return similarity.semdedup_oversized_buckets(_t(spark, sf_dir, "embeddings"))


def q_embed_label_centroids(spark, sf_dir):
    return similarity.label_centroids(_t(spark, sf_dir, "embeddings"))


def q_embed_kmeans(spark, sf_dir):
    """Lloyd k-means over the embedding space (SemDeDup's clustering stage /
    IVF coarse-quantizer training): md5-seeded, 2 rounds, exact int64
    fixed-point so the 2-round DuckDB CTE mirror hash-matches bit-exactly."""
    return clustering.kmeans_assign(_t(spark, sf_dir, "embeddings"))


def q_embed_cluster_sample(spark, sf_dir):
    """Cluster-balanced sampling (diversity-preserving cut, Sorscher et al.
    2022-family): at most CLUSTER_CAP vectors per k-means cluster,
    md5-priority nested cuts; rank<=cap plans through WindowGroupLimit so
    mega-clusters trim map-side before the one cluster-key shuffle."""
    return clustering.cluster_sample(_t(spark, sf_dir, "embeddings"))


def q_embed_cluster_stats(spark, sf_dir):
    """k-means inertia / elbow diagnostic: per-cluster size, exact int64
    within-cluster sum of squared distances, and mean distance — one K-row
    shuffle over the map-side assignment."""
    return clustering.cluster_stats(_t(spark, sf_dir, "embeddings"))


def q_embed_pq_encode(spark, sf_dir):
    """Product quantization (Jegou et al. 2011, the IVF-PQ storage path):
    per-subspace codebooks trained with the shared fixed-point Lloyd kernel
    — ONE shuffle per round covers ALL subspaces — then every vector stored
    as M sub-codes + exact int64 reconstruction error. The compression leg
    of embedding-scale search: 64-dim float32 at 10^12 vectors is ~256 TB;
    PQ codes are ~2 orders smaller."""
    return clustering.pq_encode(_t(spark, sf_dir, "embeddings"))


def q_sim_pq_adc_topk(spark, sf_dir):
    """IVFADC search (Jegou et al. 2011 §III) — the search leg the PQ
    storage path exists for: database vectors carry only a coarse cell id +
    M sub-codes, queries rank candidates from their nprobe probed cells by
    exact int64 asymmetric distance via a per-query M x K lookup table.
    Candidate scoring never touches the raw vector — M small-int lookups
    per database row."""
    return clustering.pq_adc_topk(_t(spark, sf_dir, "embeddings"))


def q_web_paragraph_dedup(spark, sf_dir):
    """CCNet's core dedup: paragraph-level exact dedup corpus-wide (first
    occurrence by (doc_id, pos) survives, docs re-assembled in order)."""
    return webclean.paragraph_dedup(
        webclean.synthesize_web(_t(spark, sf_dir, "documents"))
    )


def q_dedup_window_stats(spark, sf_dir):
    """Window-level duplicate-substring signal (Lee et al. 2022): per-doc
    fraction of w-token windows whose hash occurs >= 2x in the corpus."""
    return dedup.duplicate_window_stats(_t(spark, sf_dir, "documents"))


def q_multimodal_media_dedup(spark, sf_dir):
    """Image-level exact dedup across the interleaved corpus: media spans
    collapse to their underlying asset; one census shuffle picks a keeper
    per asset (first-wins, like dedup_exact)."""
    from .sources.adapters import documents_to_interleaved_rich

    return multimodal.media_asset_dedup(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_multimodal_pack(spark, sf_dir):
    """Interleaved sequence packing: the greedy pack fold where media spans
    charge a fixed vision-token cost — the batch-assembly step of an
    interleaved (text+image) pretraining pipeline."""
    from .sources.adapters import documents_to_interleaved_rich

    return packing.pack_interleaved(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_text_quality_classifier(spark, sf_dir):
    """Hashed linear quality classifier (fasttext-style serving pass, the
    DCLM/FineWeb-Edu model-filter shape): per-token hashed-bucket weights,
    integer mean logit, threshold gate — placeholder weight LUT, real
    hashing/scoring plumbing."""
    return textops.quality_classifier(_t(spark, sf_dir, "documents"))


def q_multimodal_interleave(spark, sf_dir):
    """MMC4/OBELICS-shaped interleave gates: per-doc span-kind counts,
    longest media run, media per-mille, grounding-text chars, keep rule —
    zero-shuffle pure-Column algebra over the rich interleaved table."""
    from .sources.adapters import documents_to_interleaved_rich

    return multimodal.interleave_stats(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_web_c4_filters(spark, sf_dir):
    """C4 line/doc filters (Raffel et al. 2020 §2.2): terminal-punctuation +
    min-words + javascript line rules, lorem-ipsum / curly-brace / min-kept
    doc rules, over a deterministically signal-planted web page."""
    return webclean.c4_filters(webclean.synthesize_c4(_t(spark, sf_dir, "documents")))


def q_dedup_substr_removal(spark, sf_dir):
    """ExactSubstr removal (Lee et al. 2022): every token covered by a
    w-token window that occurs >= 2x in the corpus (multiplicity counted)
    is removed; docs re-assembled from the surviving tokens."""
    return dedup.exact_substr_removal(_t(spark, sf_dir, "documents"))


def q_text_lang_id(spark, sf_dir):
    return textops.language_id(_t(spark, sf_dir, "documents"))


def q_text_weighted_sample(spark, sf_dir):
    """Quality-weighted sampling (DCLM/FineWeb-Edu resample shape): keep
    probability proportional to the classifier logit, deterministic md5
    coin — soft model filter, zero shuffle, rerun-stable."""
    return textops.quality_weighted_sample(_t(spark, sf_dir, "documents"))


def q_text_lang_fertility(spark, sf_dir):
    """Per-language tokenizer fertility report (tokens/word, chars/token by
    language) over a deterministic 4-language synthesized corpus — one
    narrow Project + one 4-key aggregation."""
    return textops.lang_fertility(
        textops.synthesize_multilingual(_t(spark, sf_dir, "documents"))
    )


def q_web_encoding_fix(spark, sf_dir):
    """ftfy-lite encoding hygiene: mojibake digraph repair, replacement/
    control-char strip + counts, dead-bytes gate on U+FFFD density —
    chained fixed-string replaces, pure Column, zero shuffle."""
    return webclean.encoding_fix(
        webclean.synthesize_encoding(_t(spark, sf_dir, "documents"))
    )


def q_multimodal_image_filters(spark, sf_dir):
    """LAION/DataComp-shaped image gates (min side, max aspect, pixel-bomb
    cap) as pure Column algebra over the real header-decode output — the
    metadata-first filter order a production image pipeline uses."""
    return multimodal.image_filters(
        multimodal.media_meta_query(_t(spark, sf_dir, "documents"))
    )


def q_corpus_chunk_interleaved(spark, sf_dir):
    """Context-boundary chunking of interleaved docs: span-atomic chunk
    assignment by exclusive-prefix cost (text = words, media = fixed
    vision-token charge) — zero shuffle, in-row prefix fold + narrow
    explode."""
    from .sources.adapters import documents_to_interleaved_rich

    return packing.chunk_interleaved(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_multimodal_phash_neardup(spark, sf_dir):
    """Perceptual near-dup of media assets: banded hamming search over a
    60-bit pHash (deterministic stand-in with real near-dup geometry; the
    DCT hash itself needs the stubbed pixel decode). simhash kernel on
    the media axis: one band shuffle, capped buckets, JVM-side pairs."""
    from .sources.adapters import documents_to_interleaved_rich

    return multimodal.media_phash_neardup(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_multimodal_dedup_apply(spark, sf_dir):
    """Media dedup APPLIED: non-keeper media occurrences dropped and span
    offsets re-sequenced, so the curated corpus is again a valid
    interleaved table under the (kind, text, media_ref, order) contract."""
    from .sources.adapters import documents_to_interleaved_rich

    return multimodal.media_dedup_apply(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_corpus_epoch_shuffle(spark, sf_dir):
    """Epoch-salted reproducible training order: md5 shard + in-shard rank,
    one shuffle onto the shard key, never a global sort."""
    return webclean.epoch_shuffle(_t(spark, sf_dir, "documents"), epoch=1)


def q_text_winnowing(spark, sf_dir):
    """Winnowing fingerprint selection (Schleimer et al. 2003 / MOSS):
    k-gram rolling hashes, rightmost window minima, ~2/(w+1) density with
    the >= w+k-1 shared-substring guarantee — zero shuffle, in-row
    windows, the fixed-recall index shrink before a cross-doc census."""
    return textops.winnowing_fingerprints(_t(spark, sf_dir, "documents"))


def q_text_moss_overlap(spark, sf_dir):
    """Cross-document MOSS overlap report over the winnowing selection:
    df-capped inverted index on selected fingerprints, JVM-side in-list
    pairs, per-pair shared count + per-mille coverage of each side's
    fingerprint set (lower-bounds copied-passage coverage by the
    >= w+k-1-token winnowing guarantee)."""
    return textops.winnowing_overlap(_t(spark, sf_dir, "documents"))


def q_web_url_dedup(spark, sf_dir):
    """URL canonicalization + dedup-by-URL (the crawl pipeline's first
    dedup, CCNet/C4): scheme/www/fragment/utm/trailing-slash canonical
    chain, keeper = window min on the canonical key (no join back)."""
    return webclean.url_dedup(
        webclean.synthesize_urls(_t(spark, sf_dir, "documents"))
    )


def q_web_url_dedup_params(spark, sf_dir):
    """Param-level URL canonicalization (tracking params dropped anywhere,
    survivors sorted) under the same window-min keeper kernel — the
    production swap-in for the regex-chain canonicalizer."""
    return webclean.url_dedup_params(
        webclean.synthesize_urls_messy(_t(spark, sf_dir, "documents"))
    )


def q_web_badwords(spark, sf_dir):
    """C4 §2.2 blocklist rule: token-membership badword match (words, not
    substrings) with counts and keep gate over a planted schedule —
    placeholder 3-entry list, real isin-over-array plumbing."""
    return webclean.badwords_filter(
        webclean.synthesize_badwords(_t(spark, sf_dir, "documents"))
    )


def q_text_perplexity(spark, sf_dir):
    """CCNet-style unigram-LM perplexity score + high-perplexity flag,
    integer fixed-point log2 end-to-end (Spark == DuckDB bit-exact)."""
    return textops.unigram_perplexity(_t(spark, sf_dir, "documents"))


def q_text_bigram_ppl(spark, sf_dir):
    """Stupid-backoff bigram-LM perplexity (Brants et al. 2007, the
    web-scale n-gram scheme): P(cur|prev) from a hard-capped bigram census,
    fixed backoff penalty onto the unigram LM, 1/16-bit int64 log2
    end-to-end (Spark == DuckDB bit-exact)."""
    return textops.bigram_perplexity(_t(spark, sf_dir, "documents"))


def q_text_script_ratios(spark, sf_dir):
    """Script/charset detection (the writing-system axis of language ID):
    per-mille codepoint-class ratios + argmax script over a deterministic
    multilingual rewrite (Cyrillic/CJK/mixed planted by md5 schedule)."""
    return textops.script_ratios(
        textops.synthesize_scripts(_t(spark, sf_dir, "documents"))
    )


def q_text_char_entropy(spark, sf_dir):
    """Character-entropy gate (Dolma/RedPajama gibberish detector): Shannon
    entropy of the doc's own char distribution in 1/16-bit int64 fixed
    point, both tails gated (repeated-char junk low, base64-ish payloads
    high) over a planted two-tail rewrite — zero shuffle, all in-row."""
    return textops.char_entropy(
        textops.synthesize_entropy(_t(spark, sf_dir, "documents"))
    )


def q_web_url_blocklist(spark, sf_dir):
    """RefinedWeb URL filtering: hard registered-domain blocklist +
    weighted soft keyword score over the URL path, both pure Column
    algebra over a planted crawl frontier — zero shuffle."""
    return webclean.url_blocklist_filter(
        webclean.synthesize_url_frontier(_t(spark, sf_dir, "documents"))
    )


def q_text_dsir(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): per-doc log ratio of a
    hashed-bigram target-domain LM vs the raw-corpus LM, int64 fixed-point
    log2 (the data-selection score a pretraining pipeline resamples by)."""
    return textops.dsir_weights(_t(spark, sf_dir, "documents"))


def q_text_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity terciles (Wenzek et al. 2020):
    tercile thresholds from a cumulative sum over the bounded per-doc
    score histogram (no global sort), then a 1-row threshold crossJoin."""
    return textops.ppl_buckets(_t(spark, sf_dir, "documents"))


def q_text_tfidf_topk(spark, sf_dir):
    """Per-document tf-idf keywords: top-3 tokens by tf * int64 fixed-point
    idf (the keyword/topic-signal pass); per-doc top-k plans through
    WindowGroupLimit, the df join keyed on the unbounded token census."""
    return textops.tfidf_topk(_t(spark, sf_dir, "documents"))


def q_text_bpe_tokens(spark, sf_dir):
    return textops.bpe_token_stats(_t(spark, sf_dir, "documents"))


def q_text_bpe_encode(spark, sf_dir):
    """Tokenizer APPLICATION: encode every document with the corpus-trained
    BPE merge table (train -> apply, the full tokenizer loop). The checked
    relation carries the first word's actual tokenization, not just counts."""
    return bpe.bpe_encode(_t(spark, sf_dir, "documents"))


def q_text_rolling_fingerprint(spark, sf_dir):
    return textops.rolling_fingerprint(_t(spark, sf_dir, "documents"))


def q_text_repetition(spark, sf_dir):
    """Gopher repetition signals, shuffle-free (sorted-gram run folds vs
    the oracle's explode+groupBy formulation)."""
    return textops.repetition_stats(_t(spark, sf_dir, "documents"))


def q_bpe_train_merges(spark, sf_dir):
    """Tokenizer training: top-8 BPE merges learned over the corpus
    vocabulary (iterative argmax + merge, CC-fixpoint driver pattern)."""
    return bpe.bpe_train_merges(_t(spark, sf_dir, "documents"))


def q_web_synthesize(spark, sf_dir):
    """Deterministic web-page-shaped text (lines + boilerplate + PII),
    native Columns, DuckDB-mirrored byte-exact (gate on the corpus side so
    a hygiene-operator failure localizes to the operator)."""
    return webclean.synthesize_web(_t(spark, sf_dir, "documents"))


def q_web_boilerplate_lines(spark, sf_dir):
    """CCNet/C4 frequency rule, detection side: lines in >= MIN_DF docs,
    capped + deterministically ordered (the bounded broadcast set)."""
    docs = _t(spark, sf_dir, "documents")
    return webclean.boilerplate_lines(webclean.synthesize_web(docs))


def q_web_boilerplate_strip(spark, sf_dir):
    """Corpus-wide boilerplate-line removal: ONE aggregation shuffle for the
    frequency census, then a broadcast + narrow higher-order filter — the
    corpus is never exploded/regrouped."""
    docs = _t(spark, sf_dir, "documents")
    return webclean.strip_boilerplate(webclean.synthesize_web(docs))


def q_web_boilerplate_lines_scaled(spark, sf_dir):
    """Corpus-fraction threshold (max(MIN_DF, ceil(n_docs/32)) computed
    inside the plan): the scale-stable variant — an absolute min_df
    qualifies ever more lines as the corpus grows (tests/test_webclean.py
    proves the 10x divergence)."""
    docs = _t(spark, sf_dir, "documents")
    return webclean.boilerplate_lines(
        webclean.synthesize_web(docs), min_df_frac=webclean.MIN_DF_FRAC
    )


def q_web_boilerplate_overflow(spark, sf_dir):
    """No-silent-caps report: frequency-qualifying lines beyond the
    broadcast cap (same contract as the LSH hot-bucket reports)."""
    docs = _t(spark, sf_dir, "documents")
    return webclean.boilerplate_overflow(webclean.synthesize_web(docs))


def q_web_pii_redact(spark, sf_dir):
    """Email/URL/IPv4/phone counting + redaction, pure Column regexes."""
    docs = _t(spark, sf_dir, "documents")
    return webclean.redact_pii(webclean.synthesize_web(docs))


def q_web_url_domains(spark, sf_dir):
    """URL extraction + per-domain (n_urls, n_docs) census."""
    docs = _t(spark, sf_dir, "documents")
    return webclean.url_domain_stats(webclean.synthesize_web(docs))


def q_corpus_sample_hash(spark, sf_dir):
    """Deterministic md5-bucket sampling (reproducible across runs/retries,
    unlike rand())."""
    return webclean.hash_sample(_t(spark, sf_dir, "documents"))


def q_corpus_sample_stratified(spark, sf_dir):
    """Per-language sampling rates on the same md5 bucket — deterministic
    AND nested (lower rate => strict subset), the language-rebalancing
    knob."""
    return webclean.stratified_hash_sample(_t(spark, sf_dir, "documents"))


def q_corpus_mixture_sample(spark, sf_dir):
    """Token-budget mixture sampling: a global token budget split across
    languages by weight, keep rates derived per-language, md5-bucket cut
    (deterministic + nested). The corpus-mixing pass of a training run."""
    return webclean.mixture_sample(_t(spark, sf_dir, "documents"))


def q_corpus_mixture_audit(spark, sf_dir):
    """Per-language budget-vs-achieved report for the mixture sample (what
    a pipeline operator alarms on)."""
    return webclean.mixture_audit(_t(spark, sf_dir, "documents"))


def q_corpus_domain_cap(spark, sf_dir):
    """Per-domain quota (C4/RefinedWeb anti-domination cap): keep at most
    DOMAIN_CAP docs per URL host, md5-priority order; rank<=cap is planned
    through Spark's WindowGroupLimit so mega-domains are trimmed map-side
    before the one domain-key shuffle."""
    return webclean.domain_cap(_t(spark, sf_dir, "documents"))


def q_corpus_curation_flags(spark, sf_dir):
    """End-to-end curation chain as one per-doc flag relation — the
    driver-gated twin of jobs/hygiene_job.py: boilerplate strip -> PII
    redaction -> Gopher gates -> perplexity gate -> exact-dedup keeper
    (planted duplicates) -> hash sample; keep = the job's keep rule."""
    return curation.curation_flags(_t(spark, sf_dir, "documents"))


def q_corpus_pack_by_split(spark, sf_dir):
    """Split-aware packing — the last mile before a training run:
    leakage-safe train/val/test assignment (md5 coin on the near-dup
    group key) feeding the greedy pack fold PER SPLIT, each split with its
    own token budget (train at context length, eval splits shorter). A
    sequence is keyed (split, stream, seq_id), so no pack can mix splits."""
    return packing.pack_by_split(_t(spark, sf_dir, "documents"))


def q_corpus_curation_packed(spark, sf_dir):
    """The hygiene job's --pack-budget tail composed end-to-end: the
    curation keepers' redacted text greedily packed into fixed-budget
    pretraining sequences (one extra pack-stream shuffle beyond the
    curation chain); oracle replays the fold as a recursive CTE over the
    same kept set."""
    return curation.curation_packed(_t(spark, sf_dir, "documents"))


def q_corpus_pack_sequences(spark, sf_dir):
    """Sequence packing: greedy fixed-token-budget fill per deterministic
    pack stream (the pretraining-batch assembly step); oracle replays the
    fold as a recursive CTE."""
    return packing.pack_sequences(_t(spark, sf_dir, "documents"))


def q_corpus_pack_stats(spark, sf_dir):
    """Packing utilization per stream (n_seqs / docs / tokens / max fill)."""
    return packing.pack_stats(_t(spark, sf_dir, "documents"))


def q_window_funnel(spark, sf_dir):
    """ClickHouse-style windowFunnel over the events stream: per user the
    deepest view -> click -> purchase chain whose steps occur in timestamp
    order with the WHOLE chain inside a 1h window of its first step
    (ClickHouse windowFunnel semantics), folded with the latest-start DP
    (one pass over the user's time-sorted events — a later first step
    re-anchors the window); output = the depth histogram.

    100 TB shape: ONE groupBy(user_id) -> sorted event array -> an in-row
    aggregate fold (3-long accumulator), then a tiny depth groupBy. The
    per-user array is the session-bounded width a funnel always needs;
    production pre-buckets by (user, day) exactly like the sessionizer."""
    ev = _t(spark, sf_dir, "events")
    W = 3_600_000_000  # 1h in microseconds
    S0, S1, S2 = "view", "click", "purchase"
    e = ev.select(
        "user_id",
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            F.col("event_id").cast("long").alias("eid"),
            F.col("event_type").alias("ty"),
        ).alias("ev"),
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list("ev")).alias("evs")
    )
    init = F.struct(
        F.lit(-1).cast("long").alias("s1"),
        F.lit(-1).cast("long").alias("s2"),
        F.lit(-1).cast("long").alias("s3"),
    )

    def step(acc, x):
        s1 = F.when(x["ty"] == S0, x["t"]).otherwise(acc["s1"])
        s2 = F.when(
            (x["ty"] == S1) & (acc["s1"] >= 0) & (x["t"] - acc["s1"] <= W),
            F.greatest(acc["s2"], acc["s1"]),
        ).otherwise(acc["s2"])
        s3 = F.when(
            (x["ty"] == S2) & (acc["s2"] >= 0) & (x["t"] - acc["s2"] <= W),
            F.greatest(acc["s3"], acc["s2"]),
        ).otherwise(acc["s3"])
        return F.struct(s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))

    acc = F.aggregate(F.col("evs"), init, step)
    depth = (
        F.when(acc["s3"] >= 0, 3)
        .when(acc["s2"] >= 0, 2)
        .when(acc["s1"] >= 0, 1)
        .otherwise(0)
    )
    return (
        per_user.select(depth.cast("int").alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_WINDOW_FUNNEL = """
WITH evs AS (
  SELECT user_id,
         list_sort(list(struct_pack(
           t := epoch_us(ts), eid := CAST(event_id AS BIGINT),
           ty := event_type))) AS evs
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id,
         list_reduce(
           list_concat([[CAST(-1 AS BIGINT), -1, -1]],
                       list_transform(evs, x -> [x.t,
                         CASE x.ty WHEN 'view' THEN 0 WHEN 'click' THEN 1
                                   WHEN 'purchase' THEN 2 ELSE 3 END, 0])),
           (acc, x) -> [
             CASE WHEN x[2] = 0 THEN x[1] ELSE acc[1] END,
             CASE WHEN x[2] = 1 AND acc[1] >= 0 AND x[1] - acc[1] <= 3600000000
                  THEN GREATEST(acc[2], acc[1]) ELSE acc[2] END,
             CASE WHEN x[2] = 2 AND acc[2] >= 0 AND x[1] - acc[2] <= 3600000000
                  THEN GREATEST(acc[3], acc[2]) ELSE acc[3] END
           ]) AS s
  FROM evs
)
SELECT CAST(CASE WHEN s[3] >= 0 THEN 3 WHEN s[2] >= 0 THEN 2
                 WHEN s[1] >= 0 THEN 1 ELSE 0 END AS INT) AS depth,
       COUNT(*)::BIGINT AS n_users
FROM folded GROUP BY 1
"""


def q_sim_matryoshka(spark, sf_dir):
    """Matryoshka truncation eval (Kusupati et al. 2022): exact top-K at
    each prefix width vs the full-dim top-K — mean overlap@K per-mille and
    top-1 retention per width, the relation an embedding-serving rollout
    decides on. Bounded-query broadcast crossJoin x widths via one
    explode; candidates stream once."""
    return similarity.matryoshka_overlap(_t(spark, sf_dir, "embeddings"))


def q_text_quality_calibrate(spark, sf_dir):
    """Quality-gate threshold calibration: for each target keep rate the
    largest whole-Flesch-point threshold whose gate keeps at least the
    target count (the snapshot-drift-tracking way real gates are set) —
    bounded-histogram cumsum, the tercile kernel generalized."""
    return textops.quality_calibrate(_t(spark, sf_dir, "documents"))


def q_web_host_quality(spark, sf_dir):
    """Crawl-frontier prioritization: per-host doc count, token mass, mean
    clamped Flesch and the quality x log-size priority — ONE host-keyed
    census with map-side partials, output host-space-sized."""
    return webclean.host_quality_rank(_t(spark, sf_dir, "documents"))


def q_web_intradoc_dedup(spark, sf_dir):
    """Within-document line dedup (Dolma's intra-doc repetition removal,
    next to the cross-doc passes): repeated lines dropped keeping the
    first occurrence, order preserved — zero shuffle, pure in-row array
    fold (the HOF-trap-safe single-reference aggregate)."""
    return webclean.intradoc_line_dedup(_t(spark, sf_dir, "documents"))


def q_corpus_curriculum(spark, sf_dir):
    """Quality-annealed curriculum schedule: CCNet ppl terciles as the
    difficulty axis, head trains from epoch 0, middle from 1, tail from 2;
    each (doc, epoch) row carries its epoch-salted shard/pos so the
    relation IS the training order (one sorted shard file per
    (epoch, shard))."""
    return curation.curriculum_schedule(_t(spark, sf_dir, "documents"))


def q_corpus_pack_bpe(spark, sf_dir):
    """Tokenizer-aware packing: the greedy pack fold costed in
    corpus-trained BPE tokens (train -> apply -> pack, the composition a
    real pretraining pipeline runs) instead of whitespace words; the
    encoding adds NO shuffle (merge table = K collected constants, pure
    Column fold)."""
    return packing.pack_sequences_bpe(_t(spark, sf_dir, "documents"))


def q_dedup_incremental_neardup(spark, sf_dir):
    """Incremental NEAR-dup dedup (the fuzzy twin of dedup_incremental):
    new-batch docs near-matched against the kept history via a banded
    minhash join (history hot bands census-capped) and against smaller
    in-batch docs — the planted copies are EDITED, so the exact md5 pass
    provably misses every one of them (asserted in tests)."""
    return dedup.incremental_neardup(_t(spark, sf_dir, "documents"))


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware dedup keeper: one row per exact-content cluster with
    the min-shout-ratio keeper (tie: min doc_id) next to the naive
    min-doc_id keeper — ONE struct-min groupBy, no window/sort/join-back.
    Planted structure: shouted copies sit at the original doc_id so the
    naive keeper provably picks the worst copy and keep_best recovers the
    clean one."""
    return dedup.keep_best_dedup(
        dedup.synthesize_quality_dup_corpus(_t(spark, sf_dir, "documents"))
    )


def q_corpus_doremi_weights(spark, sf_dir):
    """DoReMi-lite domain reweighting (Xie et al. 2023 direction): domains
    aggregate token-weighted mean surprisal under the corpus unigram LM;
    weight = baseline token share x excess surprisal over the easiest
    domain, then a budget-pct token budget turns weights into keep rates.
    All int64 fixed-point; one doc_id join + one domain-space groupBy on
    top of the LM pass."""
    return curation.doremi_weights(_t(spark, sf_dir, "documents"))


def q_corpus_doremi_sample(spark, sf_dir):
    """The composition: documents cut by the LEARNED doremi rates with the
    same nested md5 per-mille bucket as corpus_mixture_sample
    (deterministic, retry-stable, budget-monotone)."""
    return curation.doremi_sample(_t(spark, sf_dir, "documents"))


def q_corpus_padding_report(spark, sf_dir):
    """The layout win, measured: per-stream padding waste under
    length-bucketed batching vs the naive md5-order counterfactual (same
    batch size, length ignored), with per-mille pad-per-real-token rates —
    the report that justifies corpus_length_buckets' extra shuffle key."""
    return packing.padding_report(_t(spark, sf_dir, "documents"))


def q_corpus_length_buckets(spark, sf_dir):
    """Length-bucketed batch assignment (the padding-efficient layout for
    non-packed batching: SFT, eval, embedding inference): documents bucket
    by floor(log2(n_tokens)) — bounding within-batch length spread to <2x
    — then batch in md5 order inside (bucket, stream); per-doc padding
    waste (batch_max - n_tokens) rides the same window partition. ONE
    shuffle; parallelism = buckets x streams."""
    return packing.length_bucket_batches(_t(spark, sf_dir, "documents"))


def q_corpus_decontaminate(spark, sf_dir):
    """Benchmark decontamination: per training doc, distinct word-8-grams
    shared with the (broadcast) benchmark gram set; planted positives must
    be recovered exactly. The corpus is never shuffled."""
    docs = _t(spark, sf_dir, "documents")
    return decontam.contamination_report(decontam.synthesize_eval_split(docs))


def q_html_synthesize(spark, sf_dir):
    """Deterministic chrome-laden page per document, native Columns; the
    DuckDB oracle rebuilds the same bytes independently (gate on the corpus
    side so an html_main_content failure localizes to the extractor)."""
    return htmlops.synthesize_html(_t(spark, sf_dir, "documents"))


def q_html_main_content(spark, sf_dir):
    """HTML boilerplate strip (north-rule operator): DOM-prior +
    link-density block classification must recover the document's exact
    text from the synthesized page — the oracle is the identity."""
    docs = _t(spark, sf_dir, "documents")
    return htmlops.strip_boilerplate(htmlops.synthesize_html(docs))


def q_html_block_stats(spark, sf_dir):
    """Block census from the real DOM walk vs the closed-form count."""
    docs = _t(spark, sf_dir, "documents")
    return htmlops.block_stats(htmlops.synthesize_html(docs))


def q_multimodal_decode_meta(spark, sf_dir):
    return multimodal.media_meta_query(_t(spark, sf_dir, "documents"))


def q_multimodal_payload_phash(spark, sf_dir):
    """Per-payload perceptual hash over the media table: the true DCT pHash
    when a codec is installed AND the payload decodes; the loud 60-bit md5
    stub otherwise. This corpus synthesizes header-only images, so the rows
    are identical with and without a codec — the oracle mirrors the stub."""
    return multimodal.media_payload_phash(
        multimodal.media_table(_t(spark, sf_dir, "documents"))
    )


# --------------------------------------------- extraction engine, SQL-checked

def q_multimodal_resize(spark, sf_dir):
    return multimodal.resize_media(
        multimodal.media_table(_t(spark, sf_dir, "documents"))
    )


def q_multimodal_frames(spark, sf_dir):
    return multimodal.frame_sample(
        multimodal.media_table(_t(spark, sf_dir, "documents"))
    )


def q_extract_media_preservation(spark, sf_dir):
    """Runs the FULL extraction pipeline; media spans must be preserved
    exactly (multiset equality with the adapter's media assignment)."""
    docs = _t(spark, sf_dir, "documents")
    spans = extract_spans(documents_to_interleaved(docs))
    return spans.filter(F.col("kind") == "media").select("doc_id", "media_ref")


SQL_EXTRACT_MEDIA_PRESERVATION = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'img://' || CAST(doc_id AS VARCHAR) || '/fig0' AS media_ref
FROM documents
WHERE doc_id % 4 = 0
"""


def q_extract_char_conservation(spark, sf_dir):
    """FULL pipeline; per-doc non-space character count must equal the
    input's (no pagenum-shaped spans exist in this corpus)."""
    docs = _t(spark, sf_dir, "documents")
    spans = extract_spans(documents_to_interleaved(docs))
    return (
        spans.filter(F.col("kind") != "media")
        .groupBy("doc_id")
        .agg(F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("n_chars_out"))
    )


SQL_EXTRACT_CHAR_CONSERVATION = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       length(replace(text, ' ', '')) AS n_chars_out
FROM documents
"""


# ------------------------------- extraction engine, fixture-oracle checked

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def _oracle_sf() -> str:
    """Scale-factor key for the fixture-backed flagship oracles. The driver's
    correctness gate runs at sf0.01 (the documented contract), which is the
    default; local tooling (tools/check_oracle.py) exports PDFX_ORACLE_SF so
    the fixture follows the sf_dir actually under test instead of producing a
    spurious hard FAIL at any other scale."""
    return os.environ.get("PDFX_ORACLE_SF", "0.01")


def sql_expected_spans(sf: str | None = None):
    """Oracle relation for the flagship pipeline: span sequences precomputed
    by the sequential Python oracle (oracle/document.extract_document — the
    independent implementation the 99-test pytest suite checks the engine
    against) over the REAL adapter output at fixture-gen time
    (tools/gen_expected_spans.py). The driver's hash-compare of the live
    vectorized engine against this relation is the span-sequence-equality
    contract (reference: SimpleXMLOutput.java:77-242) as a hard signal.

    Returns None when no fixture exists for the active scale factor — the
    caller then omits the oracle entry so the driver records the (weaker,
    honest) rows-only check instead of a false mismatch."""
    sf = sf if sf is not None else _oracle_sf()
    path = os.path.join(_FIXTURE_DIR, f"expected_spans_sf{sf}.parquet")
    if not os.path.exists(path):
        return None
    return (
        f"SELECT doc_id, seq, kind, text, media_ref, \"offset\" "
        f"FROM read_parquet('{path}')"
    )


def sql_expected_spans_structured(sf: str | None = None):
    """9-column oracle relation (adds page/para/style_ref) for the nested
    sink; None when the fixture for the active sf does not exist."""
    sf = sf if sf is not None else _oracle_sf()
    path = os.path.join(_FIXTURE_DIR, f"expected_spans_sf{sf}.parquet")
    if not os.path.exists(path):
        return None
    return (
        f"SELECT doc_id, seq, kind, text, media_ref, \"offset\", "
        f"page, para, style_ref FROM read_parquet('{path}')"
    )


def sql_expected_spans_words(sf: str | None = None):
    """10-column oracle relation (adds the VERBOSE per-word boxes) for the
    word-level sink; None when the fixture lacks the column (pre-round-4
    fixture) or does not exist."""
    sf = sf if sf is not None else _oracle_sf()
    path = os.path.join(_FIXTURE_DIR, f"expected_spans_sf{sf}.parquet")
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    if "words" not in pq.read_schema(path).names:
        return None
    return (
        f"SELECT doc_id, seq, kind, text, media_ref, \"offset\", "
        f"page, para, style_ref, words FROM read_parquet('{path}')"
    )


def q_extract_pipeline(spark, sf_dir):
    """Flagship: full extraction over the interleaved corpus, value-checked
    against the precomputed Python-oracle span fixture (sql_expected_spans).
    Projects the flat span-equality surface; the structural columns
    (page/para/style_ref) are exercised by serialize_pxml_nested."""
    from .operators.extract import FLAT_COLS

    docs = _t(spark, sf_dir, "documents")
    return extract_spans(documents_to_interleaved(docs)).select(*FLAT_COLS)


PAGED_GATE_MOD = 10  # deterministic 1-in-10 corpus slice for the driver gate


def q_extract_paged(spark, sf_dir):
    """The page-parallel oversized-band operator, value-checked against the
    SAME fixture as the flagship — the driver hash gate then pins
    extract_spans_paged == extract_spans == Python oracle (the skew band's
    correctness is not just a pytest claim). Runs on a deterministic
    doc_id % 10 slice: the operator pays inter-stage Arrow+shuffle overhead
    per document that the narrow path never does (that is WHY the pipeline
    only routes the oversized band through it), so gating the full corpus
    would time the wrong regime; full-corpus row equality vs the narrow
    path is pinned bit-exact in tests/test_extract_paged.py."""
    from .operators.extract import FLAT_COLS
    from .operators.extract_paged import extract_spans_paged

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % PAGED_GATE_MOD == 0
    )
    return extract_spans_paged(
        documents_to_interleaved(docs),
        page_partitions=32,
        doc_partitions=32,
    ).select(*FLAT_COLS)


def q_serialize_pxml_nested(spark, sf_dir):
    """Structural .pxml sink over the LIVE engine's structured span output
    (page/para/style_ref), value-checked against the Python-oracle fixture
    run through the DuckDB nesting mirror — this hash-checks the whole
    physical hierarchy (page ids, paragraph grouping, dominating-style refs),
    not just the flat span stream."""
    from .operators.serialize import to_pxml_nested

    docs = _t(spark, sf_dir, "documents")
    return to_pxml_nested(extract_spans(documents_to_interleaved(docs)))


def q_serialize_pxml_words(spark, sf_dir):
    """VERBOSE .pxml sink (Constants.VERBOSE_OUTPUT analog): the LIVE engine
    runs with with_words=True and the sink renders per-word <word value
    styleRef x y w h/> elements inside integer-boxed lines
    (SimpleXMLOutput.java:103-134, 226-242); value-checked against the
    Python-oracle word-box fixture run through the DuckDB verbose mirror —
    word geometry equality is checked end-to-end, not just text."""
    from .operators.serialize import to_pxml_words

    docs = _t(spark, sf_dir, "documents")
    return to_pxml_words(
        extract_spans(documents_to_interleaved(docs), with_words=True)
    )


def q_extract_dehyphenated(spark, sf_dir):
    """Full extraction + S16 dehyphenation window pass, value-checked against
    the oracle-span fixture run through the SQL dehyphenation mirror."""
    from .operators.postprocess import dehyphenate

    docs = _t(spark, sf_dir, "documents")
    return dehyphenate(extract_spans(documents_to_interleaved(docs)))


def _serializer_spans(spark, sf_dir):
    """Deterministic span stream for the XML sinks, derived from the
    documents table WITHOUT the layout pipeline (which SQL cannot replay):
    the adapter chunking, plus synthetic kinds by position so every
    serializer branch (title/heading/footnote/media/text) is exercised
    identically on both sides."""
    inter = documents_to_interleaved(_t(spark, sf_dir, "documents"))
    sp = inter.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.offset").cast("long").alias("seq"),
        F.col("s.kind").alias("k0"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
    kind = (
        F.when(F.col("k0") == "media", F.lit("media"))
        .when(F.col("seq") == 0, F.lit("title"))
        .when(F.col("seq") == 1, F.lit("heading1"))
        .when(F.col("seq") == 2, F.lit("footnote"))
        .otherwise(F.lit("text"))
    )
    return sp.withColumn("kind", kind).drop("k0")


SQL_SERIALIZER_SPANS = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(doc_id AS BIGINT) AS n,
         string_split(text, ' ') AS ws,
         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT) AS nc
  FROM documents
)
SELECT doc_id, i AS seq,
       CASE WHEN i = 0 THEN 'title' WHEN i = 1 THEN 'heading1'
            WHEN i = 2 THEN 'footnote' ELSE 'text' END AS kind,
       array_to_string(ws[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' ') AS text,
       '' AS media_ref
FROM w, unnest(range(nc)) AS t(i)
UNION ALL
SELECT doc_id, nc AS seq, 'media' AS kind, '' AS text,
       'img://' || doc_id || '/fig0' AS media_ref
FROM w WHERE n % 4 = 0
"""


def q_dehyphenate_op(spark, sf_dir):
    """S16 dehyphenation, value-checked: deterministic hyphen injection
    (seq % 5 == 2 on non-media spans) over the serializer span stream, then
    the window merge — identical on both sides."""
    from .operators.postprocess import dehyphenate

    sp = _serializer_spans(spark, sf_dir)
    sp = sp.withColumn(
        "text",
        F.when(
            (F.col("kind") != "media") & (F.col("seq") % 5 == 2),
            F.concat(F.col("text"), F.lit("-")),
        ).otherwise(F.col("text")),
    ).withColumn("offset", F.col("seq").cast("int"))
    return dehyphenate(sp)


SQL_DEHYPH_SPANS = f"""
SELECT doc_id, seq, kind,
       CASE WHEN kind <> 'media' AND seq % 5 = 2 THEN text || '-' ELSE text END AS text,
       media_ref, CAST(seq AS INT) AS "offset"
FROM ({SQL_SERIALIZER_SPANS})
"""


def q_serialize_pxml(spark, sf_dir):
    """S15 sink: SimpleXMLOutput-style rendering (ordered agg, JVM-side)."""
    from .operators.serialize import to_pxml

    return to_pxml(_serializer_spans(spark, sf_dir))


def q_serialize_tei(spark, sf_dir):
    """S16 sink: TEI-P5-style rendering with role-mapped elements."""
    from .operators.serialize import to_tei

    return to_tei(_serializer_spans(spark, sf_dir))


def _sql_dehyphenate(spans_sql: str) -> str:
    from .operators.postprocess import sql_dehyphenate

    return sql_dehyphenate(spans_sql)


def _sql_dehyphenate_op() -> str:
    return _sql_dehyphenate(SQL_DEHYPH_SPANS)


def q_multimodal_caption_pairs(spark, sf_dir):
    """CLIP/LAION-style caption-pair mining over the interleaved corpus:
    every media span paired with its nearest text span (ties to the
    following span, MMC4-style), min-words grounding gate — zero-shuffle
    pure-Column array algebra; only the small pair structs are exploded."""
    from .sources.adapters import documents_to_interleaved_rich

    return multimodal.caption_pairs(
        documents_to_interleaved_rich(_t(spark, sf_dir, "documents"))
    )


def q_graph_host_rank(spark, sf_dir):
    """Host-level PageRank for crawl prioritization (Common Crawl-style
    host ranking): deterministic host link census from documents, then
    PR_ITERS unrolled integer fixed-point PageRank iterations — the classic
    distributed join+agg-per-iteration shape, bit-identical to the DuckDB
    unrolled-CTE mirror."""
    return graphops.host_rank(_t(spark, sf_dir, "documents"))


def q_sketch_hll_hosts(spark, sf_dir):
    """HyperLogLog distinct-docs-per-host sketch (the 10^12-scale distinct
    counter: mergeable max-per-register state, ONE bounded groupBy on
    (host, register) instead of a distinct shuffle over the corpus) with
    Flajolet's linear-counting small-range correction via an integer ln
    table embedded identically in both engines, next to the exact count
    and its per-mille error as the sandbox audit columns."""
    return sketches.hll_host_distinct(_t(spark, sf_dir, "documents"))


def q_corpus_partition_audit(spark, sf_dir):
    """Partition-skew audit for the bucket(doc_id, 256) layout every
    doc-keyed downstream join rides on: per-bucket token loads collapsed
    to max/mean ratio and the Gini coefficient (integer milli), ONE
    bounded census groupBy + a single-row in-row indexed fold — the
    relation that proves a keyed layout is balanced before committing."""
    return packing.partition_audit(_t(spark, sf_dir, "documents"))


def q_text_novelty(spark, sf_dir):
    """Per-document novelty: per-mille of the doc's trigram occurrences
    whose hash bucket no other document touches — the diversity /
    memorization-risk signal, a certified LOWER bound (collisions can only
    steal novelty). The unbounded trigram vocabulary never becomes a key:
    one doc-keyed groupBy, one <=65536-row census AQE-broadcast into the
    join, one doc-keyed fold."""
    return textops.novelty_scores(_t(spark, sf_dir, "documents"))


def q_corpus_drift_report(spark, sf_dir):
    """Crawl-snapshot drift monitor (the retraining trigger): per-language
    bucketed token-share L1 between two md5-split snapshot halves plus the
    most-shifted bucket. Hash-bucketed census bounds the state at
    |langs| x 1024 regardless of vocabulary; bucket-L1 lower-bounds the
    true token L1 (hashing cancels mass, never creates it)."""
    return textops.snapshot_drift(_t(spark, sf_dir, "documents"))


def q_window_transitions(spark, sf_dir):
    """Session path mining: the Markov transition census over consecutive
    event pairs inside a session (gap <= 30min) — which step follows
    which, and each destination's per-mille share of its source's
    out-transitions (the relation funnel designers and bot-detection
    heuristics read). Zero-window design like the funnel: ONE
    groupBy(user) -> sorted array -> in-row zip_with(evs, slice(evs, 2))
    pair algebra, then a tiny (src, dst) census with map-side combine."""
    ev = _t(spark, sf_dir, "events")
    GAP_US = 1_800_000_000  # 30 min session gap in microseconds
    e = ev.select(
        "user_id",
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            F.col("event_id").cast("long").alias("eid"),
            F.col("event_type").alias("ty"),
        ).alias("ev"),
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list("ev")).alias("evs")
    )
    pairs = F.filter(
        F.zip_with(
            F.col("evs"),
            F.slice(F.col("evs"), 2, F.size("evs")),
            lambda a, b: F.struct(
                a["ty"].alias("src"),
                b["ty"].alias("dst"),
                (b["t"] - a["t"]).alias("gap"),
            ),
        ),
        lambda x: x["gap"].isNotNull() & (x["gap"] <= GAP_US),
    )
    census = (
        per_user.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = census.groupBy("src").agg(F.sum("n").alias("_tot"))
    return (
        census.join(totals, "src")
        .select(
            "src",
            "dst",
            "n",
            F.expr("(1000 * n) div _tot").cast("long").alias("share_pm"),
        )
        .orderBy("src", "dst")
    )


SQL_WINDOW_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER w AS dst,
         epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
census AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL AND gap <= 1800000000
  GROUP BY src, dst
),
totals AS (SELECT src, SUM(n) AS tot FROM census GROUP BY src)
SELECT c.src, c.dst, c.n, CAST((1000 * c.n) // t.tot AS BIGINT) AS share_pm
FROM census c JOIN totals t ON c.src = t.src
ORDER BY c.src, c.dst
"""


def q_graph_trustrank(spark, sf_dir):
    """TrustRank (Gyongyi et al.): PageRank with the teleport restricted
    to an md5-chosen trusted seed set — trust flows out of verified hosts
    along links, hosts unreachable from any seed score zero. The
    spam-demotion complement of graph_host_rank's raw authority; same
    unrolled integer join+agg shape on host ids."""
    return graphops.trust_rank(_t(spark, sf_dir, "documents"))


def q_corpus_decontam_semantic(spark, sf_dir):
    """Embedding-space benchmark decontamination — the pass that catches
    PARAPHRASED leaks the n-gram sweeps miss: corpus and benchmark LSH
    signatures meet on (table, bucket), exact fixed-point cosine re-rank,
    corpus vectors above the semantic-duplicate threshold flagged with
    their best-matching bench item. The bench side is bounded by nature
    (AQE broadcasts it); the corpus is never shuffled on its own key."""
    return similarity.semantic_decontam(_t(spark, sf_dir, "embeddings"))


def q_corpus_temperature_sample(spark, sf_dir):
    """Temperature-scaled multilingual sampling (mBERT/XLM-R alpha=0.5
    rebalancing): per-language shares computed FROM the data as
    p^0.5 via an exact integer sqrt (double seed + int64 correction, so
    both engines agree bit-exactly), keep rates to hit the rebalanced
    token targets under a global budget, full repeat epochs for
    upsampled languages, and what the md5 coin actually kept."""
    return webclean.temperature_mixture(_t(spark, sf_dir, "documents"))


def q_sketch_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters with exact verify: the candidate
    pass is a 2048-cell (row, bucket) census — bounded regardless of
    vocabulary size — and only occurrences whose min-cell estimate clears
    the per-mille threshold reach the exact census, whose key space is
    bounded by total/threshold. CMS never undercounts, so no true heavy
    hitter is lost; the post-count re-check drops the sketch's false
    positives — output is exactly the true heavy-hitter set."""
    return sketches.heavy_hitters(_t(spark, sf_dir, "documents"))


def q_graph_host_hits(spark, sf_dir):
    """HITS hubs & authorities beside PageRank: authority mass finds
    content-bearing hosts, hub mass finds link-farm/index hosts worth
    demoting — HITS_ITERS unrolled integer fixed-point rounds over the
    same synthesized host census, max-normalized per round so Spark and
    the DuckDB unrolled-CTE mirror agree bit-exactly."""
    return graphops.host_hits(_t(spark, sf_dir, "documents"))


def q_text_readability(spark, sf_dir):
    """Flesch reading-ease quality signal in integer milli-units (vowel-
    group syllable proxy), banded easy/medium/hard — ONE narrow Project,
    zero shuffle, zero Python."""
    return textops.readability(_t(spark, sf_dir, "documents"))


def q_embed_hard_negatives(spark, sf_dir):
    """ANN-mined hard negatives for contrastive training (ANCE-style): per
    vector, the most-similar LSH candidate with a different label — composes
    the scale-adaptive ann_lsh_pairs kernel + a label join + one struct-max
    groupBy; ties to the smaller neg_id for cross-engine determinism."""
    return similarity.hard_negatives(_t(spark, sf_dir, "embeddings"))



def q_corpus_rank_sample(spark, sf_dir):
    """Authority-weighted corpus sampling: every document keeps with
    probability proportional to its host's PageRank share (keep_permille =
    1000*score div max_score, deterministic md5 coin) — the composition
    that makes graph_host_rank feed curation, one shuffle join on host."""
    return graphops.rank_weighted_sample(_t(spark, sf_dir, "documents"))



def q_text_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (corpus mining / targeted curation): queries
    derived deterministically from the mid-frequency vocabulary head;
    integer fixed-point scoring (milli tf-saturation, shared s16 idf);
    salted TWO-STAGE top-k so no reducer sees a whole query's candidates."""
    return retrieval.bm25_topk(_t(spark, sf_dir, "documents"))


def q_text_bm25_bench_topk(spark, sf_dir):
    """BM25 with queries drawn from the BENCHMARK side of the eval split
    (out-of-corpus query terms, the contamination-sweep / corpus-mining
    shape) ranked over the train side only; term selection gated by
    train-side rarity so the planted passage's bigrams — bench df = 100%
    by construction — stay eligible as queries."""
    return retrieval.bm25_bench_topk(_t(spark, sf_dir, "documents"))


def q_corpus_split_assign(spark, sf_dir):
    """Leakage-safe train/val/test split: md5 per-mille coin keyed on the
    near-dup GROUP (MinHash-LSH pairs -> CC representative), so duplicates
    never straddle a split boundary. One left join + narrow hash Project
    on top of the existing dedup kernels."""
    return curation.leakage_safe_split(_t(spark, sf_dir, "documents"))


def q_corpus_split_audit(spark, sf_dir):
    """Split-leakage audit: cross-split near-dup pairs under group keying
    (0 by construction) vs the naive doc-keyed counterfactual, plus
    per-split doc counts and the near-dup group census."""
    return curation.split_leakage_audit(_t(spark, sf_dir, "documents"))


def q_corpus_decontam_fuzzy(spark, sf_dir):
    """Perturbation-robust benchmark decontamination: shared 3-gram
    shingles vs the broadcast benchmark shingle set, reported next to the
    exact 8-gram hit count on the same corpus — the synthesis plants a
    period-7 perturbed passage that the exact pass provably misses."""
    return decontam.fuzzy_contamination_report(
        decontam.synthesize_perturbed_leaks(_t(spark, sf_dir, "documents"))
    )


def q_dedup_cdc_chunks(spark, sf_dir):
    """Content-defined chunk dedup census (FastCDC/LBFS boundaries applied
    to token streams): hash-gated chunk boundaries make identical passages
    hash to identical chunks at ANY document offset, unlike fixed windows.
    In-row Column algebra for boundary+chunk assembly, ONE groupBy census."""
    return dedup.cdc_chunk_dedup(_t(spark, sf_dir, "documents"))


def q_window_retention(spark, sf_dir):
    """Cohort retention (the product-analytics DAU grid): users bucketed
    by first-seen day, and for each (cohort_day, day_offset) the fraction
    of the cohort active that day in milli. Two user-keyed censuses (first
    day + distinct active days) joined on user, then one bounded
    (cohort, offset) groupBy — offsets span the fixture window, cohorts
    the calendar: both bounded domains, never doc/event-sized keys."""
    ev = _t(spark, sf_dir, "events")
    DAY_US = 86_400_000_000
    days = ev.select(
        "user_id", F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias("day")
    ).distinct()
    # feeds the cohort census AND the activity join
    days = days.localCheckpoint(eager=False)
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    grid = (
        days.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        grid.join(sizes, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "n_cohort",
            F.expr("(1000 * n_active) div n_cohort").cast("long").alias(
                "retention_milli"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


SQL_WINDOW_RETENTION = """
WITH days AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts::TIMESTAMP) // 86400000000) AS day
  FROM events
),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
),
sizes AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
  FROM cohort GROUP BY cohort_day
),
grid AS (
  SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM days d JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT g.cohort_day, g.day_offset, g.n_active, s.n_cohort,
       CAST((1000 * g.n_active) // s.n_cohort AS BIGINT) AS retention_milli
FROM grid g JOIN sizes s USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


def q_web_url_features(spark, sf_dir):
    """URL-side quality features (path depth, length, params, tracking)
    over the crawl-frontier synthesis — the filter web pipelines run
    before reading a byte of content. Zero shuffle."""
    return webclean.url_features(
        webclean.synthesize_urls(_t(spark, sf_dir, "documents"))
    )


def q_window_event_mix(spark, sf_dir):
    """Per-day event-type composition (count + per-mille share of the
    day): the adoption/drift relation — a type's share trending says a
    feature is growing or a collector stopped logging it. ONE
    calendar-bounded (day, type) census + a day-total join (both sides
    calendar-sized)."""
    ev = _t(spark, sf_dir, "events")
    DAY_US = 86_400_000_000
    base = ev.select(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias(
            "day"
        ),
        "event_type",
    )
    census = base.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = census.groupBy("day").agg(F.sum("n").alias("day_total"))
    return (
        census.join(totals, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            "event_type",
            "n",
            F.expr("(1000 * n) div day_total").cast("long").alias("share_pm"),
        )
        .orderBy("day", "event_type")
    )


SQL_WINDOW_EVENT_MIX = """
WITH census AS (
  SELECT (epoch_us(ts::TIMESTAMP) // 86400000000) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
totals AS (SELECT day, SUM(n) AS day_total FROM census GROUP BY day)
SELECT CAST(c.day AS BIGINT) AS day, c.event_type, c.n,
       CAST((1000 * c.n) // t.day_total AS BIGINT) AS share_pm
FROM census c JOIN totals t USING (day)
ORDER BY day, event_type
"""


GROWTH_STEPS = 8  # corpus-prefix eighths


def q_corpus_growth_curve(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law): distinct token count at each
    md5-ordered corpus-prefix eighth — the 'is more of this source still
    adding new content' acquisition relation (a flattening curve says the
    marginal crawl buys repetition, not coverage).

    Exact at any scale WITHOUT re-scanning per prefix: a token's
    contribution to prefix k is determined by the FIRST eighth it appears
    in, so ONE (token -> min bucket) census + a GROWTH_STEPS-key histogram
    + an in-row cumulative fold computes the whole curve. Same trick as
    the retention/first-seen censuses: first-appearance reduces a
    per-prefix distinct to one groupBy."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("gr|"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % GROWTH_STEPS
    )
    toks = docs.select(
        bucket.alias("b"),
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    first = toks.groupBy("token").agg(F.min("b").alias("fb"))
    hist = first.groupBy("fb").agg(
        F.count(F.lit(1)).cast("long").alias("new_tokens")
    )
    ndocs = docs.select(bucket.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    merged = hist.join(ndocs, hist.fb == ndocs.b, "full_outer").select(
        F.coalesce("fb", "b").alias("step"),
        F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
        F.coalesce("nd", F.lit(0)).alias("nd"),
    )
    one = merged.agg(
        F.collect_list(F.struct("step", "new_tokens", "nd")).alias("_hs")
    )
    return (
        one.select(F.explode("_hs").alias("h"), "_hs")
        .select(
            (F.col("h.step") + 1).cast("long").alias("prefix_eighths"),
            F.expr(
                "aggregate(filter(_hs, e -> e.step <= h.step), 0L,"
                " (acc, e) -> acc + e.nd)"
            )
            .cast("long")
            .alias("n_docs"),
            F.col("h.new_tokens").cast("long").alias("new_tokens"),
            F.expr(
                "aggregate(filter(_hs, e -> e.step <= h.step), 0L,"
                " (acc, e) -> acc + e.new_tokens)"
            )
            .cast("long")
            .alias("n_distinct_tokens"),
        )
        .orderBy("prefix_eighths")
    )


SQL_CORPUS_GROWTH_CURVE = f"""
WITH toks AS (
  SELECT ('0x' || substr(md5('gr|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % {GROWTH_STEPS} AS b,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
           AS token
  FROM documents
),
first AS (SELECT token, MIN(b) AS fb FROM toks GROUP BY token),
hist AS (
  SELECT fb, CAST(COUNT(*) AS BIGINT) AS new_tokens FROM first GROUP BY fb
),
nd AS (
  SELECT ('0x' || substr(md5('gr|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % {GROWTH_STEPS} AS b,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM documents GROUP BY 1
),
merged AS (
  SELECT COALESCE(h.fb, n.b) AS step,
         COALESCE(h.new_tokens, 0) AS new_tokens,
         COALESCE(n.nd, 0) AS nd
  FROM hist h FULL OUTER JOIN nd n ON h.fb = n.b
)
SELECT CAST(m.step + 1 AS BIGINT) AS prefix_eighths,
       (SELECT CAST(SUM(m2.nd) AS BIGINT) FROM merged m2
        WHERE m2.step <= m.step) AS n_docs,
       CAST(m.new_tokens AS BIGINT) AS new_tokens,
       (SELECT CAST(SUM(m2.new_tokens) AS BIGINT) FROM merged m2
        WHERE m2.step <= m.step) AS n_distinct_tokens
FROM merged m
ORDER BY prefix_eighths
"""


def q_dedup_minhash_calibration(spark, sf_dir):
    """MinHash estimator calibration: matching-component count vs EXACT
    shingle Jaccard per band — E[m/16] = J, so a biased band means the
    sketch is broken before any dedup acts on it. Pair-volume-sized
    truth joins + one <=17-key census."""
    return dedup.minhash_calibration(_t(spark, sf_dir, "documents"))


def q_graph_link_health(spark, sf_dir):
    """Link-graph sanity census: sinks (PageRank leak points), sources
    (link-unreachable hosts a frontier must seed), edge/host totals —
    host-space-sized throughout."""
    return graphops.link_health(_t(spark, sf_dir, "documents"))


def q_embed_norm_audit(spark, sf_dir):
    """Embedding-norm histogram (log2 buckets of the exact fixed-point
    squared norm) — the 'actually unit-normalized?' check every
    cosine/IVF consumer assumes; a second mode = mixed encoder batch.
    One Project + one bounded census."""
    return similarity.norm_audit(_t(spark, sf_dir, "embeddings"))


BOT_USERS = 4
BOT_EVENTS = 50
BOT_MIN_EVENTS = 20
BOT_DISP_PM = 10  # gap dispersion (var/mean^2) per-mille threshold


def q_window_bot_users(spark, sf_dir):
    """Bot detection over the event log: per user, event count and the
    DISPERSION of inter-event gaps (var/mean^2 in exact integer per-mille
    — scale-free, so a 30s bot and a 10min bot both read ~0) with the
    high-rate + clockwork flag. Humans burst and pause (dispersion >> 0);
    schedulers tick. Planted bots ('b0'..'b3', exact 60s cadence) flag;
    every organic user must not.

    Scale shape: ONE user-partitioned lag window + ONE user-keyed census
    (map-side partials); the dispersion arithmetic is the exact
    n*ssq - s^2 identity — no sqrt, no floats, bit-equal mirrors."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    n_rows = BOT_USERS * BOT_EVENTS
    bots = (
        ev.agg(F.count(F.lit(1)).alias("_n"))
        .select(F.explode(F.sequence(F.lit(0), F.lit(n_rows - 1))).alias("k"))
        .select(
            F.concat(F.lit("b"), (F.col("k") % BOT_USERS).cast("string")).alias(
                "user_id"
            ),
            F.expr(
                f"timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, (k div {BOT_USERS}) * 60)"
            ).alias("ts"),
        )
    )
    allev = ev.unionByName(bots)
    gap = F.expr(
        "unix_micros(ts) - unix_micros(lag(ts) over"
        " (partition by user_id order by ts))"
    )
    gaps = allev.select(
        "user_id", (gap / F.lit(1_000_000)).cast("long").alias("g")
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("g").cast("long").alias("n_gaps"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("ssq"),
    )
    disp = F.expr(
        "CASE WHEN s IS NULL OR s = 0 THEN 1000000"
        " ELSE (1000 * (n_gaps * ssq - s * s)) div (s * s) END"
    ).cast("long")
    return (
        agg.select(
            "user_id",
            "n_events",
            "n_gaps",
            F.coalesce(F.expr("s div greatest(1, n_gaps)"), F.lit(0))
            .cast("long")
            .alias("mean_gap_s"),
            disp.alias("dispersion_pm"),
        )
        .select(
            "*",
            (
                (F.col("n_events") >= BOT_MIN_EVENTS)
                & (F.col("dispersion_pm") <= BOT_DISP_PM)
            ).alias("bot_flag"),
        )
        .orderBy("user_id")
    )


SQL_WINDOW_BOT_USERS = f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id, ts::TIMESTAMP AS ts FROM events
  UNION ALL
  SELECT 'b' || CAST(k % {BOT_USERS} AS VARCHAR),
         TIMESTAMP '2024-01-01 00:00:00'
           + to_seconds((k // {BOT_USERS}) * 60)
  FROM (SELECT unnest(range({BOT_USERS * BOT_EVENTS})) AS k)
),
gaps AS (
  SELECT user_id,
         CAST((epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts))) // 1000000 AS BIGINT) AS g
  FROM ev
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(g) AS BIGINT) AS n_gaps,
         SUM(g) AS s, SUM(g * g) AS ssq
  FROM gaps GROUP BY user_id
)
SELECT user_id, n_events, n_gaps,
       CAST(COALESCE(s // GREATEST(1, n_gaps), 0) AS BIGINT) AS mean_gap_s,
       CAST(CASE WHEN s IS NULL OR s = 0 THEN 1000000
            ELSE (1000 * (n_gaps * ssq - s * s)) // (s * s) END AS BIGINT)
         AS dispersion_pm,
       (n_events >= {BOT_MIN_EVENTS} AND
        (CASE WHEN s IS NULL OR s = 0 THEN 1000000
         ELSE (1000 * (n_gaps * ssq - s * s)) // (s * s) END)
          <= {BOT_DISP_PM}) AS bot_flag
FROM agg
ORDER BY user_id
"""


def q_sim_table_curve(spark, sf_dir):
    """ANN operating curve on the table-count dial: verified pairs by the
    FIRST table that catches them + cumulative — flat tail = wasted
    tables, climbing tail = add tables. Same plan as ann_lsh_pairs plus a
    min(table_id) agg column."""
    return similarity.ann_table_curve(_t(spark, sf_dir, "embeddings"))


def q_dedup_savings(spark, sf_dir):
    """Per-strategy dedup savings rollup (exact / URL / near-dup): docs and
    tokens before/after each keeper pass — what each pass buys, as one
    3-row relation. Each strategy is a 1-row aggregate over its keeper."""
    return dedup.dedup_savings(_t(spark, sf_dir, "documents"))


def q_text_ocr_artifacts(spark, sf_dir):
    """OCR damage gate (glyph confusions + broken words — the scanned-PDF
    failure every other hygiene gate passes): rn-bigram density +
    broken-stopword marker over the planted-damage synthesis. One narrow
    Project, zero shuffle."""
    return textops.ocr_artifacts(
        textops.synthesize_ocr_corpus(_t(spark, sf_dir, "documents"))
    )


def q_window_timeout_curve(spark, sf_dir):
    """Sessionize-timeout sensitivity curve: for each log2 gap-bucket
    boundary T, the session count a timeout of T would produce — EXACTLY
    n_users + #gaps > T, so the whole curve reads off the bounded gap
    histogram with zero extra passes over the events. The dial-choosing
    relation next to window_gap_quantiles: pick the knee, not a folklore
    constant."""
    ev = _t(spark, sf_dir, "events")
    gap_s = F.expr(
        "(unix_micros(cast(ts as timestamp))"
        " - unix_micros(cast(lag(ts) over"
        " (partition by user_id order by ts) as timestamp))) div 1000000"
    )
    gaps = ev.select(gap_s.alias("gap_s")).filter(F.col("gap_s").isNotNull())
    bucket = (F.length(F.bin(F.col("gap_s") + 1)) - 1).cast("long")
    hist = gaps.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps")
    )
    users = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    one = hist.crossJoin(users).groupBy("n_users").agg(
        F.collect_list(F.struct("bucket", "n_gaps")).alias("_bs")
    )
    # timeout candidate per bucket boundary: T = 2^(b+1) - 2 (the bucket's
    # inclusive hi edge), sessions = n_users + gaps in buckets > b
    return (
        one.select("n_users", F.explode("_bs").alias("b"), "_bs")
        .select(
            (
                F.pow(F.lit(2.0), F.col("b.bucket") + 1).cast("long") - 2
            ).alias("timeout_s"),
            F.col("n_users"),
            (
                F.col("n_users")
                + F.expr(
                    "aggregate(filter(_bs, e -> e.bucket > b.bucket), 0L,"
                    " (acc, e) -> acc + e.n_gaps)"
                )
            )
            .cast("long")
            .alias("n_sessions"),
        )
        .orderBy("timeout_s")
    )


SQL_WINDOW_TIMEOUT_CURVE = """
WITH gaps AS (
  SELECT (epoch_us(ts::TIMESTAMP)
          - epoch_us(lag(ts::TIMESTAMP) OVER
              (PARTITION BY user_id ORDER BY ts))) // 1000000 AS gap_s
  FROM events
),
hist AS (
  SELECT CAST(length(bin((gap_s + 1)::BIGINT)) - 1 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY 1
),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events)
SELECT CAST(2 ** (h.bucket + 1) AS BIGINT) - 2 AS timeout_s,
       u.n_users,
       CAST(u.n_users + COALESCE((SELECT SUM(h2.n_gaps) FROM hist h2
                                  WHERE h2.bucket > h.bucket), 0) AS BIGINT)
         AS n_sessions
FROM hist h, u
ORDER BY timeout_s
"""


def q_html_meta(spark, sf_dir):
    """Page-metadata extraction (title, headline, anchor/paragraph/comment
    counts) — the indexer's first pass: pure regexp Column algebra, zero
    shuffle, zero Python."""
    return htmlops.html_meta(_t(spark, sf_dir, "documents"))


def q_web_site_components(spark, sf_dir):
    """Hosts grouped into sites via CC over the mirror-host pair graph —
    the host-level dedup/quota unit (planted mirrors m3/h3 and p7/h7 form
    multi-host sites; everyone else is a singleton). Host-space-sized
    throughout."""
    return graphops.site_components(_t(spark, sf_dir, "documents"))


def q_window_gap_quantiles(spark, sf_dir):
    """Inter-event gap distribution in log2-second buckets with cumulative
    per-mille — the relation that JUSTIFIES the sessionize timeout: read
    the p95 gap off cum_pm instead of folklore-30-minutes. One user-keyed
    lag window (partitioned — never global), a <=40-key bounded bucket
    census, cum via an in-row fold over the collected bounded frame."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = F.expr(
        "(unix_micros(cast(ts as timestamp))"
        " - unix_micros(cast(lag(ts) over"
        " (partition by user_id order by ts) as timestamp))) div 1000000"
    )
    gaps = ev.select(gap_s.alias("gap_s")).filter(F.col("gap_s").isNotNull())
    # log2 bucket via bit length: bucket b covers [2^b - 1, 2^(b+1) - 2]
    # seconds shifted by the +1 guard; 0-second gaps land in bucket 0
    bucket = (F.length(F.bin(F.col("gap_s") + 1)) - 1).cast("long")
    hist = gaps.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps")
    )
    one = hist.agg(
        F.collect_list(F.struct("bucket", "n_gaps")).alias("_bs"),
        F.sum("n_gaps").alias("_total"),
    )
    return (
        one.select(F.explode("_bs").alias("b"), "_bs", "_total")
        .select(
            F.col("b.bucket").alias("bucket"),
            (F.pow(F.lit(2.0), F.col("b.bucket")).cast("long") - 1).alias(
                "lo_s"
            ),
            (
                F.pow(F.lit(2.0), F.col("b.bucket") + 1).cast("long") - 2
            ).alias("hi_s"),
            F.col("b.n_gaps").alias("n_gaps"),
            F.expr(
                "(1000 * aggregate(filter(_bs, e -> e.bucket <= b.bucket),"
                " 0L, (acc, e) -> acc + e.n_gaps)) div _total"
            )
            .cast("long")
            .alias("cum_pm"),
        )
        .orderBy("bucket")
    )


SQL_WINDOW_GAP_QUANTILES = """
WITH gaps AS (
  SELECT (epoch_us(ts::TIMESTAMP)
          - epoch_us(lag(ts::TIMESTAMP) OVER
              (PARTITION BY user_id ORDER BY ts))) // 1000000 AS gap_s
  FROM events
),
hist AS (
  SELECT CAST(length(bin((gap_s + 1)::BIGINT)) - 1 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT SUM(n_gaps) AS total FROM hist)
SELECT h.bucket,
       CAST(2 ** h.bucket AS BIGINT) - 1 AS lo_s,
       CAST(2 ** (h.bucket + 1) AS BIGINT) - 2 AS hi_s,
       h.n_gaps,
       CAST((1000 * (SELECT SUM(h2.n_gaps) FROM hist h2
                     WHERE h2.bucket <= h.bucket)) // tot.total AS BIGINT)
         AS cum_pm
FROM hist h, tot
ORDER BY bucket
"""


def q_embed_centroid_drift(spark, sf_dir):
    """Split-half reliability of per-label centroids: exact int64 squared
    L2 between md5-half-A and half-B centroids — thin or contaminated
    labels surface as drift. ONE (label, half) groupBy with elementwise
    sums, then a |labels|-sized join."""
    return clustering.centroid_drift(_t(spark, sf_dir, "embeddings"))


def q_corpus_source_overlap(spark, sf_dir):
    """Head-vocabulary Jaccard between source pairs — the 'is the new
    source adding anything' acquisition relation. One census + a
    WindowGroupLimit top-K trim; the pair join is |sources|*K bounded."""
    return curation.source_overlap(_t(spark, sf_dir, "documents"))


def q_corpus_order_runs(spark, sf_dir):
    """Training-order mixing audit: per shard, run-length stats of
    consecutive same-language docs in epoch_shuffle read order — long runs
    = single-language gradient stretches the shuffle exists to prevent.
    Lang carried through the shard derivation, so ONE shuffle total."""
    return webclean.order_run_stats(_t(spark, sf_dir, "documents"))


def q_dedup_threshold_curve(spark, sf_dir):
    """Near-dup operating curve: candidate pairs banded by exact integer
    Jaccard decile + cumulative at-or-above counts — what each candidate
    JACCARD_MIN admits, read off one relation instead of re-running the
    miner per threshold. Cost = the shared candidate stage; the curve adds
    a <=10-key census and an in-row fold."""
    return dedup.threshold_curve(_t(spark, sf_dir, "documents"))


def q_dedup_dup_quality(spark, sf_dir):
    """Duplicate-cluster-size x quality interaction: mean shout ratio per
    dup band over the quality-skewed synthesis — duplicated mass provably
    scores worse than singleton mass here, the number that makes dedup a
    quality filter. Census + join-back + ONE 4-key band agg."""
    return dedup.dup_quality_interaction(_t(spark, sf_dir, "documents"))


def q_sketch_bloom_fpr(spark, sf_dir):
    """Bloom prefilter audit: realized false-positive rate + bit load of an
    m-bit/k-hash filter built over the history half's fingerprints, probed
    by the other half — the number that sizes bits-per-key for the
    incremental-dedup prefilter. Bit set bounded at BLOOM_M rows by
    construction; probe side joins it AQE-broadcast, hint-free."""
    return sketches.bloom_fpr(_t(spark, sf_dir, "documents"))


def q_window_anomaly_days(spark, sf_dir):
    """Daily-volume anomaly sweep over the events table: per day, event
    count, robust center/spread (lower median + MAD — outlier-immune,
    unlike mean/stddev), deviation in MAD-milli units, and the >=3-MAD
    anomaly flag. The pipeline-incident relation: a collector outage or a
    bot flood shows up as a flagged day before it poisons downstream
    censuses.

    Scale shape: ONE calendar-bounded day census (map-side partials), a
    1-row in-row fold for median/MAD (the collected array is |days| long —
    calendar-bounded at any corpus size), then a narrow crossJoin back.
    Median/MAD are exact integer folds (lower median), bit-equal in both
    engines — no percentile_approx, no floats."""
    ev = _t(spark, sf_dir, "events")
    DAY_US = 86_400_000_000
    daily = (
        ev.select(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias(
                "day"
            )
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    # lower median of a sorted array xs (1-indexed): xs[(n+1) div 2]
    med_of = lambda xs: F.element_at(xs, ((F.size(xs) + 1) / 2).cast("int"))
    stats = daily.agg(
        F.array_sort(F.collect_list("n_events")).alias("_xs")
    ).select(
        med_of(F.col("_xs")).alias("med"),
        F.col("_xs").alias("_xs"),
    ).select(
        "med",
        med_of(
            F.array_sort(
                F.transform("_xs", lambda x: F.abs(x - F.col("med")))
            )
        ).alias("mad"),
    )
    return (
        daily.crossJoin(stats)
        .select(
            F.col("day").cast("long").alias("day"),
            "n_events",
            F.col("med").cast("long").alias("med"),
            F.col("mad").cast("long").alias("mad"),
            F.expr(
                "(1000 * abs(n_events - med)) div greatest(1, mad)"
            )
            .cast("long")
            .alias("dev_milli"),
            (
                F.expr("(1000 * abs(n_events - med)) div greatest(1, mad)")
                >= 3000
            ).alias("anomaly"),
        )
        .orderBy("day")
    )


SQL_WINDOW_ANOMALY_DAYS = """
WITH daily AS (
  SELECT (epoch_us(ts::TIMESTAMP) // 86400000000) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
xs AS (SELECT list_sort(list(n_events)) AS v FROM daily),
med AS (SELECT v[(len(v) + 1) // 2] AS med, v FROM xs),
mad AS (
  SELECT med,
         list_sort(list_transform(v, x -> abs(x - med)))
           [(len(v) + 1) // 2] AS mad
  FROM med
)
SELECT CAST(d.day AS BIGINT) AS day, d.n_events,
       CAST(m.med AS BIGINT) AS med, CAST(m.mad AS BIGINT) AS mad,
       CAST((1000 * abs(d.n_events - m.med)) // GREATEST(1, m.mad) AS BIGINT)
         AS dev_milli,
       ((1000 * abs(d.n_events - m.med)) // GREATEST(1, m.mad)) >= 3000
         AS anomaly
FROM daily d, mad m
ORDER BY day
"""


def q_text_tokenizer_fit(spark, sf_dir):
    """Per-language BPE fit audit over the multilingual synthesis:
    fertility (tokens/word) and FALLBACK rate (words no merge touched) of
    the corpus-trained merge table — the under-served-language signal.
    Training cost is bpe_train_merges'; the audit is one Project + one
    |langs|-key agg, zero joins."""
    return bpe.tokenizer_fit(
        textops.synthesize_multilingual(_t(spark, sf_dir, "documents"))
    )


def q_window_activity_gini(spark, sf_dir):
    """User-activity concentration: exact integer Gini + top-1% share of
    events over the per-user activity census — the abuse/bot-detection and
    load-model relation (a Gini near 1000 means a handful of accounts
    generate the traffic).

    Exact Gini WITHOUT a global sort: users with equal event counts occupy
    consecutive ranks, so the rank-weighted sum folds over the COUNT-VALUE
    histogram (bounded by the max per-user activity, not the user space):
    one user census shuffle, one bounded histogram groupBy, a
    single-partition cumsum over that bounded frame, one global fold."""
    ev = _t(spark, sf_dir, "events")
    census = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hist = census.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    # bounded-domain single-partition window (distinct per-user activity
    # counts; same guardrail class as the flesch-point histogram)
    win = (
        Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "c",
        "m",
        (F.sum("m").over(win) - F.col("m")).alias("lt"),
    )
    agg = cum.agg(
        F.sum("m").alias("n_users"),
        F.sum(F.col("c") * F.col("m")).alias("n_events"),
        F.max(F.col("c")).alias("max_events"),
        # sum of rank*count over each equal-count run: ranks lt+1..lt+m,
        # their sum = m*(2*lt + m + 1) div 2 (always an even product)
        F.sum(F.expr("c * ((m * (2 * lt + m + 1)) div 2)")).alias("t_rank"),
        # ascending count runs, collected for the bounded top-k walk below
        # (frame size = distinct activity counts, never the user space)
        F.array_sort(
            F.collect_list(F.struct(F.col("c"), F.col("m")))
        ).alias("_runs"),
    )
    n = F.col("n_users")
    k = F.greatest(F.lit(1).cast("long"), F.expr("n_users div 100"))
    return agg.select(
        n.alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("max_events").cast("long").alias("max_events"),
        F.expr(
            "(1000 * (2 * t_rank - (n_users + 1) * n_events))"
            " div (n_users * n_events)"
        )
        .cast("long")
        .alias("gini_milli"),
        (
            F.lit(1000).cast("long")
            * F.aggregate(
                F.reverse("_runs"),
                F.struct(
                    k.alias("left"),
                    F.lit(0).cast("long").alias("mass"),
                ),
                lambda acc, r: F.struct(
                    F.greatest(
                        F.lit(0).cast("long"), acc["left"] - r["m"]
                    ).alias("left"),
                    (acc["mass"] + F.least(r["m"], acc["left"]) * r["c"]).alias(
                        "mass"
                    ),
                ),
                lambda acc: acc["mass"],
            )
        )
        .cast("long")
        .alias("_top_mass_k"),
        F.col("n_events").alias("_ne"),
    ).select(
        "n_users",
        "n_events",
        "max_events",
        "gini_milli",
        F.expr("_top_mass_k div _ne").cast("long").alias("top1pct_share_pm"),
    )


SQL_WINDOW_ACTIVITY_GINI = """
WITH census AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM census GROUP BY c),
cum AS (
  SELECT c, m,
         CAST(SUM(m) OVER (ORDER BY c) - m AS BIGINT) AS lt
  FROM hist
),
agg AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n_users,
         CAST(SUM(c * m) AS BIGINT) AS n_events,
         CAST(MAX(c) AS BIGINT) AS max_events,
         CAST(SUM(c * ((m * (2 * lt + m + 1)) // 2)) AS BIGINT) AS t_rank
  FROM cum
),
topk AS (
  -- heaviest k = max(1, n_users/100) users: walk runs from the top,
  -- take min(m, remaining) users per count run
  SELECT CAST(SUM(tk.c * LEAST(tk.m, GREATEST(0, a.k - tk.above))) AS BIGINT)
           AS top_mass
  FROM (
    SELECT c, m,
           CAST(COALESCE(SUM(m) OVER (ORDER BY c DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS above
    FROM hist
  ) tk,
  (SELECT GREATEST(1, n_users // 100) AS k FROM agg) a
)
SELECT n_users, n_events, max_events,
       CAST((1000 * (2 * t_rank - (n_users + 1) * n_events))
            // (n_users * n_events) AS BIGINT) AS gini_milli,
       CAST((1000 * t.top_mass) // a.n_events AS BIGINT) AS top1pct_share_pm
FROM agg a, topk t
"""


def q_corpus_zonemap_audit(spark, sf_dir):
    """Zone-map pruning audit: files touched per key-range probe under a
    hash layout vs the export_plan quality-sorted layout — what the sorted
    write buys at scan time, as a number. Two bounded min/max censuses +
    constant-size probe crossJoins."""
    return packing.zonemap_audit(_t(spark, sf_dir, "documents"))


def q_web_host_dup_rates(spark, sf_dir):
    """Per-host duplicate share (recrawl prioritization): fingerprint
    census + join-back + ONE host census, on the planted-mirror synthesis
    so mirror hosts show dup_pm = 1000 in the gate."""
    return graphops.host_dup_rates(
        graphops.synthesize_mirror_hosts(_t(spark, sf_dir, "documents"))
    )


def q_text_gate_agreement(spark, sf_dir):
    """Cohen's kappa (integer milli) + 2x2 confusion between the rule
    quality gate and the hashed-classifier gate — does the model add
    selectivity beyond the rules? One Project + one global aggregate,
    zero shuffle."""
    return textops.gate_agreement(_t(spark, sf_dir, "documents"))


def q_corpus_snapshot_diff(spark, sf_dir):
    """Crawl-snapshot churn census (added/removed/changed/unchanged +
    per-mille shares) — the relation that sizes an incremental reprocess.
    Fingerprint Project per side, ONE full-outer doc_id join, <=4-row agg."""
    return webclean.snapshot_diff(_t(spark, sf_dir, "documents"))


def q_embed_dim_stats(spark, sf_dir):
    """Per-dimension embedding moments (exact int64 fixed point) — the
    whitening / feature-health relation: dead dims (var ~ 0) and
    scale-skewed dims surface before they distort L2-based ANN/k-means."""
    return clustering.dim_stats(_t(spark, sf_dir, "embeddings"))


def q_dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster size histogram over the MinHash-LSH component
    graph, singleton row included — the dedup health relation (keeper win
    = sum n_removable; template explosions = fat tail)."""
    return dedup.cluster_size_histogram(_t(spark, sf_dir, "documents"))


def q_corpus_filter_funnel(spark, sf_dir):
    """Curation-gate ablation table (the C4/Gopher/RefinedWeb funnel):
    per gate in pipeline order, total kills, UNIQUE kills (docs only this
    gate rejects — the number that justifies the gate), and cumulative
    survivors. One global conditional-sum aggregate over the curation flag
    relation + an in-row 4-struct explode: no shuffle shape beyond the
    curation chain itself, constant 4-row output at any corpus size."""
    return curation.filter_funnel(_t(spark, sf_dir, "documents"))


STICKY_W = 7  # rolling active-user window (WAU); the 28-day MAU is the
#               same plan with a bigger constant


def q_window_stickiness(spark, sf_dir):
    """DAU/WAU stickiness — the engagement-health ratio next to the
    retention grid: per day, distinct daily actives over distinct actives
    in the trailing STICKY_W-day window, in milli. Exact rolling distinct:
    the distinct (user, day) census explodes each activity onto the
    STICKY_W days it keeps the user 'weekly active' for, then a second
    distinct collapses multi-activity — two calendar-keyed shuffles, both
    on (user, day)-bounded relations, never event-sized; the explode
    factor is the CONSTANT window width. Days with no trailing-window
    activity cannot appear (WAU >= DAU > 0 on every reported day)."""
    ev = _t(spark, sf_dir, "events")
    DAY_US = 86_400_000_000
    days = ev.select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias("day"),
    ).distinct()
    days = days.localCheckpoint(eager=False)  # feeds DAU and the WAU explode
    dau = days.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n_dau"))
    span = F.explode(
        F.sequence(F.col("day"), F.col("day") + (STICKY_W - 1))
    ).alias("wday")
    wau = (
        days.select("user_id", span)
        .distinct()
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            "n_dau",
            "n_wau",
            F.expr("(1000 * n_dau) div n_wau").cast("long").alias(
                "stickiness_milli"
            ),
        )
        .orderBy("day")
    )


SQL_WINDOW_STICKINESS = f"""
WITH days AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts::TIMESTAMP) // 86400000000) AS day
  FROM events
),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_dau FROM days GROUP BY day),
wau AS (
  SELECT wday AS day, CAST(COUNT(*) AS BIGINT) AS n_wau
  FROM (
    SELECT DISTINCT user_id, unnest(range(day, day + {STICKY_W})) AS wday
    FROM days
  ) GROUP BY wday
)
SELECT CAST(d.day AS BIGINT) AS day, d.n_dau, w.n_wau,
       CAST((1000 * d.n_dau) // w.n_wau AS BIGINT) AS stickiness_milli
FROM dau d JOIN wau w USING (day)
ORDER BY day
"""


def q_embed_outliers(spark, sf_dir):
    """Corrupted-embedding sweep: per vector the exact int64 distance to
    its label centroid vs the label's mean distance, outlier flag past 3x
    — the data-cleaning pass that catches failed encoder runs. Planted
    saturated twins (+2.0 on every component) must flag; originals must
    not."""
    return similarity.embed_outliers(_t(spark, sf_dir, "embeddings"))


def q_graph_reciprocity(spark, sf_dir):
    """Link-exchange / link-farm signal: per host, how many of its
    out-links are answered by a back-link (organic linking is asymmetric;
    rings reciprocate). Runs entirely on the host-space-sized distinct
    edge relation — one reverse self-join plus two degree censuses."""
    return graphops.link_reciprocity(_t(spark, sf_dir, "documents"))


def q_corpus_budget_plan(spark, sf_dir):
    """Data-constrained training-budget allocation (Muennighoff 2023
    shape): per source, a quality-weighted token allocation clamped at the
    4-epoch repeat cap, with the clipped surplus reported as shortfall —
    the 'can this corpus fill this run' relation. ONE bounded census
    groupBy + a single-row total join-back."""
    return packing.budget_plan(_t(spark, sf_dir, "documents"))


def q_sim_pq_recall(spark, sf_dir):
    """PQ serving-rollout eval (the matryoshka pattern applied to IVFADC):
    per query, recall@k of the true nearest neighbour and the top-k
    overlap of the ADC answer vs an exact int64 L2 baseline over the same
    bounded query set."""
    return clustering.pq_recall(_t(spark, sf_dir, "embeddings"))


def q_text_code_switch(spark, sf_dir):
    """Code-switching / mixed-language detection: the language_id lexicon
    argmax run per 16-word window, reporting the majority window language,
    off-majority window count, adjacent-window switches, and the
    off-majority rate in milli — zero shuffle, all in-row array algebra."""
    return textops.code_switch(_t(spark, sf_dir, "documents"))


def q_embed_training_triples(spark, sf_dir):
    """Contrastive training triples: per anchor, the best same-label
    neighbour (positive), the best cross-label neighbour (hard negative),
    and the integer-milli margin between them — one symmetrized capped-ANN
    candidate relation, ONE groupBy with two conditional struct-maxes."""
    return similarity.training_triples(_t(spark, sf_dir, "embeddings"))


def q_corpus_layout_plan(spark, sf_dir):
    """Write-layout planning relation: per partition key (source), the
    Iceberg file count to hit the target shard tokens, the corpus share,
    the skew flag, and the salt-bit width for skewed partitions — ONE
    bounded census groupBy plus a single-row total join-back. The
    planning complement of corpus_partition_audit."""
    return packing.layout_plan(_t(spark, sf_dir, "documents"))


def q_graph_anchor_text(spark, sf_dir):
    """Per-target anchor-text aggregation (the ORCAS-corpus relation): top
    anchor terms pointing at each host — map-side anchor explode bounded
    per doc, ONE (host, term) census with map-side combine, host-keyed
    WindowGroupLimit top-K trim. Shares host_edges' link kernel so the
    anchor relation and the edge census describe the same graph."""
    return graphops.anchor_text(_t(spark, sf_dir, "documents"))


def q_sim_bitext_mine(spark, sf_dir):
    """Cross-lingual bitext mining (LASER/CCMatrix shape): mutual-best
    cross-label aligned pairs over a planted bilingual embedding corpus —
    capped ANN LSH candidates, exact fixed-point cosine re-rank, the
    Artetxe–Schwenk intersection criterion via one struct-max groupBy per
    direction plus one equi-join (no window sort)."""
    return similarity.bitext_mine(_t(spark, sf_dir, "embeddings"))


def q_dedup_edit_verify(spark, sf_dir):
    """Edit-distance verification of LSH near-dup candidates: every
    candidate pair gets a banded-Levenshtein verdict over a bounded
    head+tail key (Spark's built-in `levenshtein(l, r, threshold)`, -1
    above the DP band — zero Python). Planted structure: lightly-edited
    copies (must verify) AND chimera docs sharing a prefix with a rewritten
    tail (band-collide as candidates but provably FAIL verification — the
    class a jaccard-estimate-only dedup would wrongly delete)."""
    return dedup.edit_verified_neardups(_t(spark, sf_dir, "documents"))


def q_dedup_containment(spark, sf_dir):
    """Containment near-dup pairs (Broder's containment coefficient): the
    ASYMMETRIC doc-in-doc case resemblance dedup misses — a short doc
    wholly embedded in a 10x-larger container has jaccard below any useful
    threshold but containment ~1. Same df-cut inverted-index candidate
    shape as dedup_ngram_jaccard; the planted containers provably fall
    below JACCARD_MIN while verifying at containment >= 0.8
    (missed_by_resemblance marks them)."""
    return dedup.containment_pairs(
        dedup.synthesize_containment_corpus(_t(spark, sf_dir, "documents"))
    )


def q_web_mirror_hosts(spark, sf_dir):
    """Mirror-site detection: host pairs whose exact-content-fingerprint
    Jaccard clears 0.5 — CDN twins / www splits / scraper mirrors deduped
    at HOST granularity before doc-level near-dup spends anything. ONE
    distinct (host, fingerprint) census; boilerplate fingerprints df-cut
    (hint-free anti-join); pairs assemble in capped per-fingerprint
    buckets. Runs on the planted full+partial mirror synthesis."""
    return graphops.mirror_hosts(
        graphops.synthesize_mirror_hosts(_t(spark, sf_dir, "documents"))
    )


def q_corpus_export_plan(spark, sf_dir):
    """Sorted-export range plan: exact, deterministic range-partitioner
    boundaries for a globally quality-sorted write (what Spark's
    RangePartitioner samples for), computed over the bounded whole-Flesch-
    point histogram (<= ~207 values at any corpus size). Equal-score runs
    cannot split across shards, so residual imbalance is REPORTED
    (vs_ideal_milli), never hidden. The corpus is never sorted here — this
    emits the plan a repartitionByRange export consumes."""
    return packing.export_plan(_t(spark, sf_dir, "documents"))


def q_corpus_datacard(spark, sf_dir):
    """Per-source data card (Datasheets for Datasets): volume,
    within-source exact-dup share, language mix + integer-log2 Shannon
    entropy (1/16-bit), mean Flesch, histogram-cumsum median length — the
    release artifact a corpus consumer reads first. One doc Project feeds
    four censuses, median partitioned BY SOURCE (never a global sort).
    Runs on the planted-duplicate synthesis so dup_milli exercises."""
    return curation.datacard(
        curation.synthesize_datacard_corpus(_t(spark, sf_dir, "documents"))
    )


def q_corpus_contam_attribution(spark, sf_dir):
    """Contamination attribution — the eval-side complement of
    corpus_decontaminate: per BENCHMARK item, the top training docs
    leaking it and the fraction of its grams they cover (the relation an
    eval owner reads before trusting a score). Bench gram relation stays
    benchmark-bounded (broadcast); the per-item candidate set is
    corpus-scaled so the top-k is the bm25 salted two-stage ranking
    (salt-invariance tested)."""
    return decontam.contamination_attribution(
        decontam.synthesize_eval_split(_t(spark, sf_dir, "documents"))
    )


def q_text_mattr(spark, sf_dir):
    """MATTR lexical diversity (Covington & McFall 2010): plain TTR falls
    with length so it cannot rank a mixed-length corpus; the w=25
    moving-average TTR is length-invariant (test-pinned). Hapax share is
    the vocabulary-richness companion. ZERO shuffle — one narrow Project
    of in-row array algebra, plan-asserted."""
    return textops.mattr_diversity(_t(spark, sf_dir, "documents"))


def q_corpus_unimax_sample(spark, sf_dir):
    """UniMax language allocation (Chung et al. 2023): walk languages
    low-resource first, each gets min(cap*n_lang, remaining/remaining_langs),
    the leftover WATER-FILLS upward — the redistributing complement of
    corpus_budget_plan (clamp + report shortfall) with no temperature to
    tune. The sequential walk runs as ONE in-row fold over the bounded
    language census; the rate table joins back and an md5 residual coin
    samples the fractional epoch. All three regimes exercise on the
    fixture: 'de' cap-bound at 3 epochs, mid langs water-filled ~2.9,
    'en' downsampled below one epoch."""
    return curation.unimax_sample(_t(spark, sf_dir, "documents"))


def q_corpus_shard_plan(spark, sf_dir):
    """Skew-aware key-to-worker sharding plan (crawl fetchers / per-host
    politeness queues / host-keyed reducers): isolate the heavy head onto
    dedicated shards, hash the tail — the manual twin of AQE's skew-join
    split for keyed WORK that cannot split a key across workers (per-host
    state is host-local). The heavy-candidate set is pigeonhole-bounded
    (load*16 >= total admits <= 16 hosts at ANY corpus size), so the
    ranking window runs over a constant frame. Runs on the deterministic
    skewed-host synthesis so the dedicated path exercises in the gate."""
    return packing.shard_plan(
        packing.synthesize_skewed_hosts(_t(spark, sf_dir, "documents"))
    )


def queries() -> Dict[str, Callable]:
    # Ordered so the driver's first-50 correctness window always covers the
    # entries with the least accumulated driver evidence (round-3 verdict
    # task 1). r5 final rotation (script-verified against
    # CORRECTNESS_r01-r04): this round added 76 zero-evidence operators —
    # more than the window holds — so every window slot is zero-evidence
    # (optimal coverage) and the 26 overflow rows sit at positions 51-76,
    # newest-first; every entry past those is a veteran green in >=1 prior
    # driver round. All 180 stay pytest- and check_oracle-gated every
    # round (this session's full sweep: 180/180 OK).
    return {
        "web_url_features": q_web_url_features,
        "window_event_mix": q_window_event_mix,
        "corpus_growth_curve": q_corpus_growth_curve,
        "dedup_minhash_calibration": q_dedup_minhash_calibration,
        "graph_link_health": q_graph_link_health,
        "embed_norm_audit": q_embed_norm_audit,
        "window_bot_users": q_window_bot_users,
        "sim_table_curve": q_sim_table_curve,
        "dedup_savings": q_dedup_savings,
        "text_ocr_artifacts": q_text_ocr_artifacts,
        "window_timeout_curve": q_window_timeout_curve,
        "html_meta": q_html_meta,
        "web_site_components": q_web_site_components,
        "window_gap_quantiles": q_window_gap_quantiles,
        "embed_centroid_drift": q_embed_centroid_drift,
        "corpus_source_overlap": q_corpus_source_overlap,
        "corpus_order_runs": q_corpus_order_runs,
        "dedup_threshold_curve": q_dedup_threshold_curve,
        "dedup_dup_quality": q_dedup_dup_quality,
        "sketch_bloom_fpr": q_sketch_bloom_fpr,
        "window_anomaly_days": q_window_anomaly_days,
        "text_tokenizer_fit": q_text_tokenizer_fit,
        "window_activity_gini": q_window_activity_gini,
        "corpus_zonemap_audit": q_corpus_zonemap_audit,
        "web_host_dup_rates": q_web_host_dup_rates,
        "text_gate_agreement": q_text_gate_agreement,
        "corpus_snapshot_diff": q_corpus_snapshot_diff,
        "embed_dim_stats": q_embed_dim_stats,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "corpus_filter_funnel": q_corpus_filter_funnel,
        "window_stickiness": q_window_stickiness,
        "web_mirror_hosts": q_web_mirror_hosts,
        "corpus_datacard": q_corpus_datacard,
        "corpus_contam_attribution": q_corpus_contam_attribution,
        "text_mattr": q_text_mattr,
        "corpus_unimax_sample": q_corpus_unimax_sample,
        "corpus_shard_plan": q_corpus_shard_plan,
        "dedup_containment": q_dedup_containment,
        "dedup_edit_verify": q_dedup_edit_verify,
        "sim_bitext_mine": q_sim_bitext_mine,
        "graph_anchor_text": q_graph_anchor_text,
        "corpus_layout_plan": q_corpus_layout_plan,
        "embed_training_triples": q_embed_training_triples,
        "text_code_switch": q_text_code_switch,
        "sim_pq_recall": q_sim_pq_recall,
        "corpus_budget_plan": q_corpus_budget_plan,
        "graph_reciprocity": q_graph_reciprocity,
        "embed_outliers": q_embed_outliers,
        "window_retention": q_window_retention,
        "graph_host_hits": q_graph_host_hits,
        "sketch_hll_hosts": q_sketch_hll_hosts,
        "sketch_heavy_hitters": q_sketch_heavy_hitters,
        "corpus_temperature_sample": q_corpus_temperature_sample,
        "corpus_decontam_semantic": q_corpus_decontam_semantic,
        "graph_trustrank": q_graph_trustrank,
        "window_transitions": q_window_transitions,
        "corpus_drift_report": q_corpus_drift_report,
        "text_novelty": q_text_novelty,
        "corpus_partition_audit": q_corpus_partition_audit,
        "dedup_weighted_sample": q_dedup_weighted_sample,
        "corpus_doremi_weights": q_corpus_doremi_weights,
        "corpus_doremi_sample": q_corpus_doremi_sample,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_incremental_neardup": q_dedup_incremental_neardup,
        "corpus_pack_bpe": q_corpus_pack_bpe,
        "corpus_curriculum": q_corpus_curriculum,
        "web_intradoc_dedup": q_web_intradoc_dedup,
        "sim_matryoshka": q_sim_matryoshka,
        "window_funnel": q_window_funnel,
        "text_quality_calibrate": q_text_quality_calibrate,
        "web_host_quality": q_web_host_quality,
        "dedup_semdedup_hot": q_dedup_semdedup_hot,
        "text_bm25_bench_topk": q_text_bm25_bench_topk,
        "corpus_pack_by_split": q_corpus_pack_by_split,
        "multimodal_payload_phash": q_multimodal_payload_phash,
        "text_bigram_ppl": q_text_bigram_ppl,
        "text_script_ratios": q_text_script_ratios,
        "text_char_entropy": q_text_char_entropy,
        "embed_pq_encode": q_embed_pq_encode,
        "sim_pq_adc_topk": q_sim_pq_adc_topk,
        "web_url_blocklist": q_web_url_blocklist,
        "corpus_padding_report": q_corpus_padding_report,
        "corpus_length_buckets": q_corpus_length_buckets,
        "corpus_export_plan": q_corpus_export_plan,
        "corpus_decontaminate": q_corpus_decontaminate,
        "corpus_pack_sequences": q_corpus_pack_sequences,
        "corpus_pack_stats": q_corpus_pack_stats,
        "bpe_train_merges": q_bpe_train_merges,
        "dedup_semdedup": q_dedup_semdedup,
        "corpus_sample_hash": q_corpus_sample_hash,
        "corpus_sample_stratified": q_corpus_sample_stratified,
        "html_block_stats": q_html_block_stats,
        "html_main_content": q_html_main_content,
        "html_synthesize": q_html_synthesize,
        "text_repetition": q_text_repetition,
        "web_boilerplate_lines": q_web_boilerplate_lines,
        "web_boilerplate_lines_scaled": q_web_boilerplate_lines_scaled,
        "web_boilerplate_overflow": q_web_boilerplate_overflow,
        "web_boilerplate_strip": q_web_boilerplate_strip,
        "web_pii_redact": q_web_pii_redact,
        "web_synthesize": q_web_synthesize,
        "web_url_domains": q_web_url_domains,
        "corpus_chunk_interleaved": q_corpus_chunk_interleaved,
        "corpus_curation_flags": q_corpus_curation_flags,
        "corpus_curation_packed": q_corpus_curation_packed,
        "corpus_decontam_fuzzy": q_corpus_decontam_fuzzy,
        "corpus_domain_cap": q_corpus_domain_cap,
        "corpus_epoch_shuffle": q_corpus_epoch_shuffle,
        "corpus_mixture_audit": q_corpus_mixture_audit,
        "corpus_mixture_sample": q_corpus_mixture_sample,
        "corpus_rank_sample": q_corpus_rank_sample,
        "corpus_split_assign": q_corpus_split_assign,
        "corpus_split_audit": q_corpus_split_audit,
        "dedup_cdc_chunks": q_dedup_cdc_chunks,
        "dedup_incremental": q_dedup_incremental,
        "dedup_semantic": q_dedup_semantic,
        "dedup_substr_removal": q_dedup_substr_removal,
        "dedup_window_stats": q_dedup_window_stats,
        "embed_cluster_sample": q_embed_cluster_sample,
        "embed_cluster_stats": q_embed_cluster_stats,
        "embed_hard_negatives": q_embed_hard_negatives,
        "embed_kmeans": q_embed_kmeans,
        "extract_paged": q_extract_paged,
        "graph_host_rank": q_graph_host_rank,
        "multimodal_caption_pairs": q_multimodal_caption_pairs,
        "multimodal_dedup_apply": q_multimodal_dedup_apply,
        "multimodal_image_filters": q_multimodal_image_filters,
        "multimodal_interleave": q_multimodal_interleave,
        "multimodal_media_dedup": q_multimodal_media_dedup,
        "multimodal_pack": q_multimodal_pack,
        "multimodal_phash_neardup": q_multimodal_phash_neardup,
        "serialize_pxml_nested": q_serialize_pxml_nested,
        "serialize_pxml_words": q_serialize_pxml_words,
        "text_bm25_topk": q_text_bm25_topk,
        "text_bpe_encode": q_text_bpe_encode,
        "text_dsir": q_text_dsir,
        "text_lang_fertility": q_text_lang_fertility,
        "text_moss_overlap": q_text_moss_overlap,
        "text_perplexity": q_text_perplexity,
        "text_ppl_buckets": q_text_ppl_buckets,
        "text_quality_classifier": q_text_quality_classifier,
        "text_readability": q_text_readability,
        "text_tfidf_topk": q_text_tfidf_topk,
        "text_weighted_sample": q_text_weighted_sample,
        "text_winnowing": q_text_winnowing,
        "web_badwords": q_web_badwords,
        "web_c4_filters": q_web_c4_filters,
        "web_encoding_fix": q_web_encoding_fix,
        "web_paragraph_dedup": q_web_paragraph_dedup,
        "web_url_dedup": q_web_url_dedup,
        "web_url_dedup_params": q_web_url_dedup_params,
        "dehyphenate_op": q_dehyphenate_op,
        "extract_dehyphenated": q_extract_dehyphenated,
        "serialize_pxml": q_serialize_pxml,
        "serialize_tei": q_serialize_tei,
        "agg_pricing_summary": q_agg_pricing_summary,
        "dedup_components": q_dedup_components,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_hot_buckets": q_dedup_simhash_hot_buckets,
        "dedup_simhash_neardup": q_dedup_simhash_neardup,
        "distinct_event_types": q_distinct_event_types,
        "embed_label_centroids": q_embed_label_centroids,
        "extract_char_conservation": q_extract_char_conservation,
        "extract_media_preservation": q_extract_media_preservation,
        "extract_pipeline": q_extract_pipeline,
        "filter_high_value": q_filter_high_value,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "multimodal_decode_meta": q_multimodal_decode_meta,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_resize": q_multimodal_resize,
        "sim_ann_hot_buckets": q_sim_ann_hot_buckets,
        "sim_ann_lsh": q_sim_ann_lsh,
        "sim_cosine_topk": q_sim_cosine_topk,
        "sim_ivf_topk": q_sim_ivf_topk,
        "text_bpe_tokens": q_text_bpe_tokens,
        "text_fingerprint": q_text_fingerprint,
        "text_lang_id": q_text_lang_id,
        "text_length_quantiles": q_text_length_quantiles,
        "text_quality": q_text_quality,
        "text_quality_rules": q_text_quality_rules,
        "text_rolling_fingerprint": q_text_rolling_fingerprint,
        "text_token_count": q_text_token_count,
        "text_vocabulary": q_text_vocabulary,
        "topk_customers": q_topk_customers,
        "window_sessionize": q_window_sessionize,
    }


def oracle_sql() -> Dict[str, str]:
    out = {
        "agg_pricing_summary": SQL_AGG_PRICING,
        "join_revenue_by_nation": SQL_REVENUE_BY_NATION,
        "filter_high_value": SQL_FILTER_HIGH_VALUE,
        "topk_customers": SQL_TOPK_CUSTOMERS,
        "window_sessionize": SQL_WINDOW_SESSIONIZE,
        "distinct_event_types": SQL_DISTINCT_EVENT_TYPES,
        "text_token_count": SQL_TEXT_TOKEN_COUNT,
        "text_quality": SQL_TEXT_QUALITY,
        "text_quality_rules": SQL_TEXT_QUALITY_RULES,
        "text_quality_classifier": textops.sql_quality_classifier(),
        "text_vocabulary": SQL_TEXT_VOCABULARY,
        "text_length_quantiles": SQL_TEXT_LENGTH_QUANTILES,
        "text_fingerprint": SQL_TEXT_FINGERPRINT,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_incremental": dedup.sql_incremental_dedup(),
        "dedup_weighted_sample": dedup.sql_dup_weighted_sample(),
        "web_paragraph_dedup": webclean.sql_paragraph_dedup(),
        "dedup_window_stats": dedup.sql_duplicate_window_stats(),
        "dedup_substr_removal": dedup.sql_exact_substr_removal(),
        "dedup_cdc_chunks": dedup.sql_cdc_chunk_dedup(),
        "text_bm25_topk": retrieval.sql_bm25_topk(),
        "text_bm25_bench_topk": retrieval.sql_bm25_bench_topk(),
        "text_bigram_ppl": textops.sql_bigram_perplexity(),
        "text_script_ratios": textops.sql_script_ratios(),
        "text_char_entropy": textops.sql_char_entropy(),
        "embed_pq_encode": clustering.sql_pq_encode(),
        "sim_pq_adc_topk": clustering.sql_pq_adc_topk(),
        "web_url_blocklist": webclean.sql_url_blocklist(),
        "corpus_split_assign": curation.sql_leakage_safe_split(),
        "corpus_split_audit": curation.sql_split_leakage_audit(),
        "corpus_decontam_fuzzy": decontam.sql_fuzzy_contamination_report(),
        "embed_kmeans": clustering.sql_kmeans_assign(),
        "embed_cluster_sample": clustering.sql_cluster_sample(),
        "embed_cluster_stats": clustering.sql_cluster_stats(),
        "dedup_minhash_lsh": dedup.sql_lsh_candidate_pairs(),
        "dedup_components": dedup.sql_connected_components(
            f"SELECT doc_a, doc_b FROM ({dedup.sql_lsh_candidate_pairs()})"
        ),
        "dedup_simhash": dedup.sql_simhash(),
        "dedup_simhash_neardup": dedup.sql_simhash_neardups(),
        "dedup_simhash_hot_buckets": dedup.sql_simhash_oversized_buckets(),
        "dedup_ngram_jaccard": dedup.sql_ngram_jaccard_pairs(),
        "sim_cosine_topk": similarity.sql_cosine_topk(),
        "sim_ann_lsh": similarity.sql_ann_lsh_pairs(),
        "embed_hard_negatives": similarity.sql_hard_negatives(),
        "sim_ann_hot_buckets": similarity.sql_ann_oversized_buckets(),
        "sim_ivf_topk": similarity.sql_ivf_topk(),
        "dedup_semantic": similarity.sql_semantic_dedup(),
        "dedup_semdedup": similarity.sql_semdedup_kmeans(),
        "dedup_semdedup_hot": similarity.sql_semdedup_oversized(),
        "embed_label_centroids": similarity.sql_label_centroids_agg(),
        "text_lang_id": textops.sql_language_id(),
        "text_weighted_sample": textops.sql_quality_weighted_sample(),
        "text_lang_fertility": textops.sql_lang_fertility(
            f"({textops.sql_synthesize_multilingual()})"
        ),
        "web_encoding_fix": webclean.sql_encoding_fix(),
        "web_badwords": webclean.sql_badwords_filter(),
        "text_winnowing": textops.sql_winnowing_fingerprints(),
        "text_moss_overlap": textops.sql_winnowing_overlap(),
        "web_url_dedup": webclean.sql_url_dedup(),
        "web_url_dedup_params": webclean.sql_url_dedup_params(),
        "multimodal_image_filters": multimodal.sql_image_filters(),
        "multimodal_phash_neardup": multimodal.sql_media_phash_neardup(),
        "multimodal_dedup_apply": multimodal.sql_media_dedup_apply(),
        "multimodal_caption_pairs": multimodal.sql_caption_pairs(),
        "graph_host_rank": graphops.sql_host_rank(),
        "dedup_edit_verify": dedup.sql_edit_verified_neardups(),
        "dedup_containment": dedup.sql_containment_pairs(),
        "corpus_shard_plan": packing.sql_shard_plan(
            table=f"({packing.sql_synthesize_skewed_hosts()})"
        ),
        "corpus_unimax_sample": curation.sql_unimax_sample(),
        "text_mattr": textops.sql_mattr_diversity(),
        "corpus_contam_attribution": decontam.sql_contamination_attribution(),
        "corpus_datacard": curation.sql_datacard(
            table=f"({curation.sql_synthesize_datacard_corpus()})"
        ),
        "corpus_export_plan": packing.sql_export_plan(),
        "web_mirror_hosts": graphops.sql_mirror_hosts(),
        "window_stickiness": SQL_WINDOW_STICKINESS,
        "corpus_filter_funnel": curation.sql_filter_funnel(),
        "dedup_cluster_sizes": dedup.sql_cluster_size_histogram(),
        "embed_dim_stats": clustering.sql_dim_stats(),
        "corpus_snapshot_diff": webclean.sql_snapshot_diff(),
        "text_gate_agreement": textops.sql_gate_agreement(),
        "web_host_dup_rates": graphops.sql_host_dup_rates(),
        "corpus_zonemap_audit": packing.sql_zonemap_audit(),
        "window_activity_gini": SQL_WINDOW_ACTIVITY_GINI,
        "window_anomaly_days": SQL_WINDOW_ANOMALY_DAYS,
        "sketch_bloom_fpr": sketches.sql_bloom_fpr(),
        "dedup_dup_quality": dedup.sql_dup_quality_interaction(),
        "dedup_threshold_curve": dedup.sql_threshold_curve(),
        "corpus_order_runs": webclean.sql_order_run_stats(),
        "corpus_source_overlap": curation.sql_source_overlap(),
        "embed_centroid_drift": clustering.sql_centroid_drift(),
        "window_gap_quantiles": SQL_WINDOW_GAP_QUANTILES,
        "web_site_components": graphops.sql_site_components(),
        "html_meta": htmlops.sql_html_meta(),
        "window_timeout_curve": SQL_WINDOW_TIMEOUT_CURVE,
        "text_ocr_artifacts": textops.sql_ocr_artifacts(),
        "dedup_savings": dedup.sql_dedup_savings(),
        "sim_table_curve": similarity.sql_ann_table_curve(),
        "window_bot_users": SQL_WINDOW_BOT_USERS,
        "embed_norm_audit": similarity.sql_norm_audit(),
        "graph_link_health": graphops.sql_link_health(),
        "dedup_minhash_calibration": dedup.sql_minhash_calibration(),
        "corpus_growth_curve": SQL_CORPUS_GROWTH_CURVE,
        "window_event_mix": SQL_WINDOW_EVENT_MIX,
        "web_url_features": webclean.sql_url_features(),
        "text_tokenizer_fit": bpe.sql_tokenizer_fit(
            table=f"({textops.sql_synthesize_multilingual()})"
        ),
        "sim_bitext_mine": similarity.sql_bitext_mine(),
        "graph_anchor_text": graphops.sql_anchor_text(),
        "corpus_layout_plan": packing.sql_layout_plan(),
        "embed_training_triples": similarity.sql_training_triples(),
        "text_code_switch": textops.sql_code_switch(),
        "sim_pq_recall": clustering.sql_pq_recall(),
        "corpus_budget_plan": packing.sql_budget_plan(),
        "graph_reciprocity": graphops.sql_link_reciprocity(),
        "embed_outliers": similarity.sql_embed_outliers(),
        "window_retention": SQL_WINDOW_RETENTION,
        "graph_host_hits": graphops.sql_host_hits(),
        "sketch_hll_hosts": sketches.sql_hll_host_distinct(),
        "sketch_heavy_hitters": sketches.sql_heavy_hitters(),
        "corpus_temperature_sample": webclean.sql_temperature_mixture(),
        "corpus_decontam_semantic": similarity.sql_semantic_decontam(),
        "graph_trustrank": graphops.sql_trust_rank(),
        "window_transitions": SQL_WINDOW_TRANSITIONS,
        "corpus_drift_report": textops.sql_snapshot_drift(),
        "text_novelty": textops.sql_novelty_scores(),
        "corpus_partition_audit": packing.sql_partition_audit(),
        "corpus_rank_sample": graphops.sql_rank_weighted_sample(),
        "text_readability": textops.sql_readability(),
        "corpus_chunk_interleaved": packing.sql_chunk_interleaved(),
        "corpus_epoch_shuffle": webclean.sql_epoch_shuffle(epoch=1),
        "text_perplexity": textops.sql_unigram_perplexity(),
        "text_ppl_buckets": textops.sql_ppl_buckets(),
        "text_dsir": textops.sql_dsir_weights(),
        "text_tfidf_topk": textops.sql_tfidf_topk(),
        "text_bpe_tokens": textops.sql_bpe_token_stats(),
        "text_rolling_fingerprint": textops.sql_rolling_fingerprint(),
        "text_repetition": textops.sql_repetition_stats(),
        "bpe_train_merges": bpe.sql_bpe_train_merges(),
        "text_bpe_encode": bpe.sql_bpe_encode(),
        "web_synthesize": webclean.sql_synthesize_web(),
        "web_boilerplate_lines": webclean.sql_boilerplate_lines(),
        "web_boilerplate_lines_scaled": webclean.sql_boilerplate_lines(
            min_df_frac=webclean.MIN_DF_FRAC
        ),
        "web_boilerplate_strip": webclean.sql_strip_boilerplate(),
        "web_boilerplate_overflow": webclean.sql_boilerplate_overflow(),
        "web_c4_filters": webclean.sql_c4_filters(),
        "web_pii_redact": webclean.sql_redact_pii(),
        "web_url_domains": webclean.sql_url_domain_stats(),
        "corpus_sample_hash": webclean.sql_hash_sample(),
        "corpus_sample_stratified": webclean.sql_stratified_hash_sample(),
        "corpus_mixture_sample": webclean.sql_mixture_sample(),
        "corpus_mixture_audit": webclean.sql_mixture_audit(),
        "corpus_domain_cap": webclean.sql_domain_cap(),
        "corpus_curation_flags": curation.sql_curation_flags(),
        "corpus_curation_packed": curation.sql_curation_packed(),
        "corpus_pack_by_split": packing.sql_pack_by_split(),
        "corpus_pack_sequences": packing.sql_pack_sequences(),
        "corpus_pack_stats": packing.sql_pack_stats(),
        "corpus_length_buckets": packing.sql_length_bucket_batches(),
        "corpus_padding_report": packing.sql_padding_report(),
        "corpus_doremi_weights": curation.sql_doremi_weights(),
        "corpus_doremi_sample": curation.sql_doremi_sample(),
        "dedup_keep_best": dedup.sql_keep_best_dedup(),
        "dedup_incremental_neardup": dedup.sql_incremental_neardup(),
        "corpus_pack_bpe": packing.sql_pack_sequences_bpe(),
        "corpus_curriculum": curation.sql_curriculum_schedule(),
        "web_intradoc_dedup": webclean.sql_intradoc_line_dedup(),
        "sim_matryoshka": similarity.sql_matryoshka_overlap(),
        "window_funnel": SQL_WINDOW_FUNNEL,
        "text_quality_calibrate": textops.sql_quality_calibrate(),
        "web_host_quality": webclean.sql_host_quality_rank(),
        "corpus_decontaminate": decontam.sql_contamination_report(),
        "html_synthesize": htmlops.sql_synthesize_html(),
        "html_main_content": htmlops.sql_main_content(),
        "html_block_stats": htmlops.sql_block_stats(),
        "multimodal_interleave": multimodal.sql_interleave_stats(),
        "multimodal_pack": packing.sql_pack_interleaved(),
        "multimodal_media_dedup": multimodal.sql_media_asset_dedup(),
        "multimodal_decode_meta": multimodal.sql_media_meta(),
        "multimodal_payload_phash": multimodal.sql_media_payload_phash(),
        "multimodal_resize": multimodal.sql_resize_media(),
        "multimodal_frames": multimodal.sql_frame_sample(),
        "extract_media_preservation": SQL_EXTRACT_MEDIA_PRESERVATION,
        "extract_char_conservation": SQL_EXTRACT_CHAR_CONSERVATION,
        "dehyphenate_op": _sql_dehyphenate_op(),
        "serialize_pxml": serialize.sql_to_pxml(SQL_SERIALIZER_SPANS),
        "serialize_tei": serialize.sql_to_tei(SQL_SERIALIZER_SPANS),
    }
    # flagship: the live engine vs the precomputed Python-oracle fixture.
    # When no fixture exists for the active sf the entries are omitted and
    # the driver falls back to the rows-only check (never a spurious FAIL).
    expected = sql_expected_spans()
    if expected is not None:
        out["extract_pipeline"] = expected
        out["extract_paged"] = (
            f"SELECT * FROM ({expected}) "
            f"WHERE TRY_CAST(doc_id AS BIGINT) % {PAGED_GATE_MOD} = 0"
        )
        out["extract_dehyphenated"] = _sql_dehyphenate(expected)
    structured = sql_expected_spans_structured()
    if structured is not None:
        out["serialize_pxml_nested"] = serialize.sql_to_pxml_nested(structured)
    with_words = sql_expected_spans_words()
    if with_words is not None:
        out["serialize_pxml_words"] = serialize.sql_to_pxml_words(with_words)
    return out
