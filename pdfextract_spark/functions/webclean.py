"""Web-corpus hygiene operators over the `documents` table.

The training-data passes every web-scale pipeline runs between crawl and
tokenizer: cross-document boilerplate-line removal (the CCNet/C4 frequency
rule), PII redaction, URL/domain statistics, and deterministic hash
sampling. Reference analog: the reference strips recurring page furniture
*within* a document by a frequency threshold + modal style
(`RemovePageNumbers.java:48-138` — candidate on >= half the pages);
`boilerplate_lines` applies the same idea corpus-wide across documents.

The sandbox documents carry flat low-vocab text (TESTDATA.md), so — exactly
like `functions/htmlops.synthesize_html` and `functions/multimodal`'s banded
headers — a native-Column synthesizer fabricates the structure these
operators exist for (line structure, injected boilerplate lines, PII
strings, URLs), deterministically from md5(doc_id), mirrored byte-exact by
a DuckDB oracle. The operators themselves never look at how the input was
made.

100 TB shapes:
- boilerplate detection: ONE shuffle (groupBy line over per-doc-distinct
  lines); the accepted set is df-thresholded AND capped (top-`cap` by
  frequency, deterministic tie-break) so the broadcast stays bounded — the
  strip pass is then a broadcast + narrow map, NO explode/regroup shuffle
  of the corpus itself.
- PII redaction / URL extraction: pure Column regexes, whole-stage codegen,
  zero shuffle (domain stats aggregate is one shuffle on a tiny key space).
- hash sampling: stateless narrow filter — reproducible across runs,
  cluster sizes and retries, unlike rand()-based sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

LINE_WORDS = 8
BOILERPLATE = (
    "subscribe to our newsletter for updates",
    "all rights reserved terms of service",
    "accept cookies to continue reading",
    "share this article on social media",
)
MIN_DF = 10  # a line in >= MIN_DF docs is boilerplate (corpus furniture)
CAP = 256  # broadcast bound: top-CAP lines by doc_freq (ties: line asc)

RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_URL = r"https?://[A-Za-z0-9._/-]+"
RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
RE_PHONE = r"\+\d{1,3}-\d{3}-\d{4}"
SAMPLE_PCT = 37  # keep docs whose md5 bucket (0..99) < SAMPLE_PCT


def _hx(h, pos: int, n: int):
    """Hex digits h[pos:pos+n] (1-based) as a non-negative long."""
    return F.conv(F.substring(h, pos, n), 16, 10).cast("long")


def _sql_hx(h: str, pos: int, n: int) -> str:
    return f"(('0x' || substr({h}, {pos}, {n}))::BIGINT)"


# ---------------------------------------------------------------------------
# synthesis (native Column, mirrored byte-exact in sql_synthesize_web)
# ---------------------------------------------------------------------------


def synthesize_web(documents: DataFrame) -> DataFrame:
    """(doc_id, web_text, n_lines) — deterministic web-page-shaped text:
    the document's words chunked into LINE_WORDS-word lines, plus
    md5(doc_id)-selected boilerplate lines (~1/3 of docs each) and PII
    lines (contact line with email/phone/IP/URL in ~2/3, a second
    email-only line in ~1/4)."""
    doc_id = F.col("doc_id").cast("string")
    h = F.md5(F.concat(F.lit("web|"), doc_id))
    words = F.split(F.col("text"), " ")
    n_chunks = F.floor((F.size(words) + (LINE_WORDS - 1)) / LINE_WORDS).cast("int")
    base = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * LINE_WORDS + 1, LINE_WORDS), " "),
    )

    empty = F.array().cast("array<string>")

    def opt(cond, text_col):
        return F.when(cond, F.array(text_col)).otherwise(empty)

    parts = [base]
    for k, btext in enumerate(BOILERPLATE):
        parts.append(opt(_hx(h, 1 + 2 * k, 2) % 3 == 0, F.lit(btext)))

    e1 = _hx(h, 13, 4).cast("string")
    dom = (_hx(h, 17, 2) % 10).cast("string")
    ph = F.lpad((_hx(h, 19, 4) % 10000).cast("string"), 4, "0")
    ip_a = (_hx(h, 23, 2)).cast("string")
    ip_b = (_hx(h, 25, 2)).cast("string")
    ip_c = (_hx(h, 27, 2)).cast("string")
    site = (_hx(h, 29, 2) % 100).cast("string")
    page = (_hx(h, 31, 2) % 100).cast("string")
    contact = F.concat(
        F.lit("contact user"), e1,
        F.lit("@mail"), dom,
        F.lit(".example.com or call +1-555-"), ph,
        F.lit(" from 10."), ip_a, F.lit("."), ip_b, F.lit("."), ip_c,
        F.lit(" visit https://www.site"), site,
        F.lit(".example.org/page/p"), page,
    )
    mailto = F.concat(F.lit("mailto admin"), e1, F.lit("@example.net now"))
    parts.append(opt(_hx(h, 9, 2) % 3 != 2, contact))
    parts.append(opt(_hx(h, 11, 2) % 4 == 0, mailto))

    lines = F.concat(*parts)
    return documents.select(
        doc_id.alias("doc_id"),
        F.array_join(lines, "\n").alias("web_text"),
        F.size(lines).cast("int").alias("n_lines"),
    )


def sql_synthesize_web(table: str = "documents") -> str:
    h = "md5('web|' || CAST(doc_id AS VARCHAR))"
    w = LINE_WORDS
    base = (
        f"list_transform(range(0, CAST((len(string_split(text, ' ')) + {w - 1}) // {w} AS INT)), "
        f"i -> array_to_string(list_slice(string_split(text, ' '), i * {w} + 1, i * {w} + {w}), ' '))"
    )
    parts = [base]
    for k, btext in enumerate(BOILERPLATE):
        parts.append(
            f"(CASE WHEN {_sql_hx(h, 1 + 2 * k, 2)} % 3 = 0 THEN ['{btext}'] "
            f"ELSE CAST([] AS VARCHAR[]) END)"
        )
    e1 = f"CAST({_sql_hx(h, 13, 4)} AS VARCHAR)"
    dom = f"CAST({_sql_hx(h, 17, 2)} % 10 AS VARCHAR)"
    ph = f"lpad(CAST({_sql_hx(h, 19, 4)} % 10000 AS VARCHAR), 4, '0')"
    ip_a = f"CAST({_sql_hx(h, 23, 2)} AS VARCHAR)"
    ip_b = f"CAST({_sql_hx(h, 25, 2)} AS VARCHAR)"
    ip_c = f"CAST({_sql_hx(h, 27, 2)} AS VARCHAR)"
    site = f"CAST({_sql_hx(h, 29, 2)} % 100 AS VARCHAR)"
    page = f"CAST({_sql_hx(h, 31, 2)} % 100 AS VARCHAR)"
    contact = (
        f"('contact user' || {e1} || '@mail' || {dom} || '.example.com or call +1-555-' || {ph}"
        f" || ' from 10.' || {ip_a} || '.' || {ip_b} || '.' || {ip_c}"
        f" || ' visit https://www.site' || {site} || '.example.org/page/p' || {page})"
    )
    mailto = f"('mailto admin' || {e1} || '@example.net now')"
    parts.append(
        f"(CASE WHEN {_sql_hx(h, 9, 2)} % 3 != 2 THEN [{contact}] ELSE CAST([] AS VARCHAR[]) END)"
    )
    parts.append(
        f"(CASE WHEN {_sql_hx(h, 11, 2)} % 4 = 0 THEN [{mailto}] ELSE CAST([] AS VARCHAR[]) END)"
    )
    lines = " || ".join(parts)
    return (
        f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
        f"COALESCE(array_to_string({lines}, chr(10)), '') AS web_text, "
        f"CAST(len({lines}) AS INT) AS n_lines FROM {table}"
    )


# ---------------------------------------------------------------------------
# boilerplate-line removal (CCNet/C4 frequency rule)
# ---------------------------------------------------------------------------


MIN_DF_FRAC = 1.0 / 32  # dyadic: exact in binary, ceil() agrees everywhere


def boilerplate_census(web: DataFrame) -> DataFrame:
    """(line, doc_freq) for EVERY distinct line — the one aggregation
    shuffle the detection family shares. Callers that need both the capped
    set and the overflow report should compute this once (persist it) and
    pass it to both, halving the census cost (jobs/hygiene_job.py does)."""
    per_doc = web.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("web_text", "\n"))).alias("line"),
    )
    return per_doc.groupBy("line").agg(F.count("*").cast("long").alias("doc_freq"))


def boilerplate_lines(
    web: DataFrame,
    min_df: int = MIN_DF,
    cap: int = CAP,
    min_df_frac: float | None = None,
    census: DataFrame | None = None,
) -> DataFrame:
    """(line, doc_freq) — lines appearing in >= threshold distinct
    documents, top-`cap` by frequency (line asc on ties). One shuffle:
    groupBy(line) over per-document-distinct lines (array_distinct BEFORE
    the explode, so a line repeated within one doc counts once and the
    shuffle carries one row per (doc, distinct line)).

    Scale dial: an ABSOLUTE min_df degrades as the corpus grows — at 10x
    docs every line shared by >= min_df documents qualifies, exactly the
    static-key-space failure mode of round-1's LSH (fixed in
    tests/test_scale_adaptive.py). With `min_df_frac` set the threshold is
    max(min_df, ceil(frac * n_docs)), computed INSIDE the plan (a 1-row
    count broadcast-joined onto the census — no driver action), so the
    qualifying set is a stable corpus property at any scale."""
    counts = census if census is not None else boilerplate_census(web)
    if min_df_frac is not None:
        total = web.agg(F.count("*").alias("_n_docs"))
        thr = F.greatest(
            F.lit(min_df).cast("long"),
            F.ceil(F.lit(float(min_df_frac)) * F.col("_n_docs")),
        )
        counts = (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("doc_freq") >= thr)
            .drop("_n_docs")
        )
    else:
        counts = counts.filter(F.col("doc_freq") >= min_df)
    return counts.orderBy(F.desc("doc_freq"), "line").limit(cap)


def boilerplate_overflow(
    web: DataFrame,
    min_df: int = MIN_DF,
    cap: int = CAP,
    census: DataFrame | None = None,
    min_df_frac: float | None = None,
) -> DataFrame:
    """(n_qualifying, n_broadcast, n_overflow) — how many frequency-
    qualifying lines exceeded the broadcast cap (those are NOT stripped).
    The cap is what bounds the broadcast at any corpus size; this reports
    the truncation instead of hiding it — the same contract as the LSH
    hot-bucket reports (`dedup_simhash_hot_buckets`, `sim_ann_hot_buckets`).

    `min_df_frac` applies the SAME in-plan corpus-fraction threshold as
    boilerplate_lines(min_df_frac=...) — the report must count the very set
    the strip acts on, whichever threshold rule is live (round-3 advice: a
    report computed under a different threshold describes a different
    layout). At production scale the fraction IS the rule (CCNet strips by
    document fraction, not absolute count)."""
    counts = census if census is not None else boilerplate_census(web)
    if min_df_frac is not None:
        total = web.agg(F.count("*").alias("_n_docs"))
        thr = F.greatest(
            F.lit(min_df).cast("long"),
            F.ceil(F.lit(float(min_df_frac)) * F.col("_n_docs")),
        )
        counts = (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("doc_freq") >= thr)
            .drop("_n_docs")
        )
    else:
        counts = counts.filter(F.col("doc_freq") >= min_df)
    qualifying = counts.agg(F.count("*").cast("long").alias("n_qualifying"))
    n = F.col("n_qualifying")
    return qualifying.select(
        n,
        F.least(n, F.lit(cap).cast("long")).alias("n_broadcast"),
        F.greatest(n - cap, F.lit(0).cast("long")).alias("n_overflow"),
    )


def sql_boilerplate_overflow(
    table: str = "documents",
    min_df: int = MIN_DF,
    cap: int = CAP,
    min_df_frac: float | None = None,
) -> str:
    thr = str(min_df)
    if min_df_frac is not None:
        thr = (
            f"GREATEST({min_df}, CEIL({float(min_df_frac)!r} * "
            f"(SELECT COUNT(*) FROM synth)))"
        )
    return f"""
WITH synth AS ({sql_synthesize_web(table)}),
q AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_qualifying FROM (
    SELECT line FROM (
      SELECT DISTINCT doc_id, line FROM (
        SELECT doc_id, unnest(string_split(web_text, chr(10))) AS line FROM synth
      )
    ) GROUP BY line HAVING COUNT(*) >= {thr}
  )
)
SELECT n_qualifying,
       CAST(least(n_qualifying, {cap}) AS BIGINT) AS n_broadcast,
       CAST(greatest(n_qualifying - {cap}, 0) AS BIGINT) AS n_overflow
FROM q
"""


def strip_boilerplate(web: DataFrame, min_df: int = MIN_DF, cap: int = CAP) -> DataFrame:
    """(doc_id, n_lines, n_removed, clean_text) — drop corpus-frequent lines
    from every document. The accepted set (bounded by `cap`) is broadcast
    as ONE array row; the strip itself is a narrow higher-order filter —
    the corpus is never exploded or regrouped."""
    blist = boilerplate_lines(web, min_df, cap).agg(
        F.sort_array(F.collect_list("line")).alias("blines")
    )
    lines = F.split("web_text", "\n")
    kept = F.filter(lines, lambda l: ~F.array_contains(F.col("blines"), l))
    return web.crossJoin(F.broadcast(blist)).select(
        "doc_id",
        F.size(lines).cast("int").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_removed"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def sql_boilerplate_lines(
    table: str = "documents",
    min_df: int = MIN_DF,
    cap: int = CAP,
    min_df_frac: float | None = None,
) -> str:
    thr = str(min_df)
    if min_df_frac is not None:
        thr = (
            f"GREATEST({min_df}, CEIL({float(min_df_frac)!r} * "
            f"(SELECT COUNT(*) FROM synth)))"
        )
    return f"""
WITH synth AS ({sql_synthesize_web(table)}),
per_doc AS (
  SELECT DISTINCT doc_id, line FROM (
    SELECT doc_id, unnest(string_split(web_text, chr(10))) AS line FROM synth
  )
)
SELECT line, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM per_doc GROUP BY line HAVING COUNT(*) >= {thr}
ORDER BY doc_freq DESC, line LIMIT {cap}
"""


def sql_strip_boilerplate(table: str = "documents", min_df: int = MIN_DF, cap: int = CAP) -> str:
    return f"""
WITH synth AS ({sql_synthesize_web(table)}),
bl AS (
  SELECT COALESCE(list(line), CAST([] AS VARCHAR[])) AS blines
  FROM ({sql_boilerplate_lines(table, min_df, cap)})
)
SELECT s.doc_id,
       CAST(len(string_split(s.web_text, chr(10))) AS INT) AS n_lines,
       CAST(len(string_split(s.web_text, chr(10)))
            - len(list_filter(string_split(s.web_text, chr(10)),
                              l -> NOT list_contains(bl.blines, l))) AS INT) AS n_removed,
       COALESCE(array_to_string(
         list_filter(string_split(s.web_text, chr(10)),
                     l -> NOT list_contains(bl.blines, l)), chr(10)), '') AS clean_text
FROM synth s, bl
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def redact_pii(web: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_urls, n_ips, n_phones, redacted_text) — counts
    measured on the original text; replacement chain ordered so earlier
    tokens cannot create or destroy later matches (emails carry '@' which
    URLs never do; '<URL>'/'<EMAIL>' contain no digits for the IP/phone
    passes). Pure Column regexes — zero shuffle."""
    t = F.col("web_text")
    red = F.regexp_replace(t, RE_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, RE_URL, "<URL>")
    red = F.regexp_replace(red, RE_IPV4, "<IP>")
    red = F.regexp_replace(red, RE_PHONE, "<PHONE>")
    return web.select(
        "doc_id",
        F.regexp_count(t, F.lit(RE_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(RE_URL)).cast("int").alias("n_urls"),
        F.regexp_count(t, F.lit(RE_IPV4)).cast("int").alias("n_ips"),
        F.regexp_count(t, F.lit(RE_PHONE)).cast("int").alias("n_phones"),
        red.alias("redacted_text"),
    )


def sql_redact_pii(table: str = "documents") -> str:
    def cnt(pat: str) -> str:
        return f"CAST(len(regexp_extract_all(web_text, '{pat}')) AS INT)"

    red = "web_text"
    for pat, tok in (
        (RE_EMAIL, "<EMAIL>"),
        (RE_URL, "<URL>"),
        (RE_IPV4, "<IP>"),
        (RE_PHONE, "<PHONE>"),
    ):
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    return f"""
WITH synth AS ({sql_synthesize_web(table)})
SELECT doc_id,
       {cnt(RE_EMAIL)} AS n_emails,
       {cnt(RE_URL)} AS n_urls,
       {cnt(RE_IPV4)} AS n_ips,
       {cnt(RE_PHONE)} AS n_phones,
       {red} AS redacted_text
FROM synth
"""


# ---------------------------------------------------------------------------
# URL / domain statistics
# ---------------------------------------------------------------------------


def url_domain_stats(web: DataFrame) -> DataFrame:
    """(domain, n_urls, n_docs) — extract URLs, aggregate by host. The only
    shuffle is the groupBy on the (small) domain key space."""
    urls = web.select(
        "doc_id",
        F.explode(F.regexp_extract_all("web_text", F.lit(RE_URL), 0)).alias("url"),
    )
    return (
        urls.select("doc_id", F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_urls"), "domain")
    )


def sql_url_domain_stats(table: str = "documents") -> str:
    return f"""
WITH synth AS ({sql_synthesize_web(table)}),
urls AS (
  SELECT doc_id, unnest(regexp_extract_all(web_text, '{RE_URL}')) AS url FROM synth
)
SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM urls GROUP BY domain ORDER BY n_urls DESC, domain
"""


# ---------------------------------------------------------------------------
# deterministic hash sampling
# ---------------------------------------------------------------------------


def hash_sample(documents: DataFrame, pct: int = SAMPLE_PCT) -> DataFrame:
    """(doc_id, n_chars, bucket) — keep docs whose md5-derived bucket
    (0..99) < pct. Stateless narrow filter: the same doc lands on the same
    side of the cut across runs, retries and cluster sizes (rand()-based
    sampling does not — retried tasks redraw)."""
    doc_id = F.col("doc_id").cast("string")
    bucket = (_hx(F.md5(F.concat(F.lit("sample|"), doc_id)), 1, 4) % 100).cast("int")
    return (
        documents.select(
            doc_id.alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket") < pct)
        .orderBy("doc_id")
    )


def sql_hash_sample(table: str = "documents", pct: int = SAMPLE_PCT) -> str:
    h = "md5('sample|' || CAST(doc_id AS VARCHAR))"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST({_sql_hx(h, 1, 4)} % 100 AS INT) AS bucket
FROM {table} WHERE {_sql_hx(h, 1, 4)} % 100 < {pct} ORDER BY doc_id
"""


STRATA_PCT = {"en": 80, "de": 40, "fr": 40}  # sandbox mix; production dial
STRATA_DEFAULT_PCT = 20


def stratified_hash_sample(
    documents: DataFrame,
    rates: dict[str, int] | None = None,
    default_pct: int = STRATA_DEFAULT_PCT,
) -> DataFrame:
    """(doc_id, lang, bucket) — per-stratum sampling rates (the standard
    language-rebalancing knob: up-sample scarce languages, down-sample the
    dominant one). Same md5 bucket as hash_sample, so the per-language cut
    is deterministic and nested: lowering a language's rate yields a strict
    subset of the higher-rate sample (seeded-rand sampling does neither)."""
    rates = STRATA_PCT if rates is None else rates
    doc_id = F.col("doc_id").cast("string")
    bucket = (_hx(F.md5(F.concat(F.lit("sample|"), doc_id)), 1, 4) % 100).cast("int")
    pct = F.lit(default_pct)
    for lang, r in sorted(rates.items()):
        pct = F.when(F.col("lang") == lang, F.lit(r)).otherwise(pct)
    return (
        documents.select(
            doc_id.alias("doc_id"),
            F.col("lang").cast("string").alias("lang"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket") < pct)
        .orderBy("doc_id")
    )


def sql_stratified_hash_sample(
    table: str = "documents",
    rates: dict[str, int] | None = None,
    default_pct: int = STRATA_DEFAULT_PCT,
) -> str:
    rates = STRATA_PCT if rates is None else rates
    h = "md5('sample|' || CAST(doc_id AS VARCHAR))"
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(rates.items())
    )
    pct = f"(CASE {whens} ELSE {default_pct} END)"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(lang AS VARCHAR) AS lang,
       CAST({_sql_hx(h, 1, 4)} % 100 AS INT) AS bucket
FROM {table} WHERE {_sql_hx(h, 1, 4)} % 100 < {pct} ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (CCNet's per-paragraph hash dedup)
# ---------------------------------------------------------------------------


def paragraph_dedup(web: DataFrame) -> DataFrame:
    """(doc_id, n_paras, n_kept, dedup_text) — CCNet's core dedup: every
    paragraph (line of the synthesized web text) is hashed corpus-wide and
    only its FIRST occurrence (min (doc_id, pos), deterministic) survives;
    documents are re-assembled from their kept paragraphs in original order.
    This is finer than doc-level dedup (dedup_exact/minhash) and coarser
    than window-level (duplicate_window_stats): the unit is the paragraph,
    the rule is exact equality.

    100 TB shape: the census groupBy carries map-side partial aggregation
    (min + count combine), so corpus-hot paragraphs (boilerplate that
    escaped the line strip) are skew-SAFE at the aggregate. The join back
    is keyed on md5(para) — a fixed-width 32-char key instead of arbitrary
    paragraph text — and its census side is exactly 1 row per key, the
    shape AQE's skew-join split handles (the big side's hot partition is
    split, the 1-row side is duplicated). Three shuffles total (census,
    join, per-doc regroup) — the same pass count as CCNet's own
    hash/dedup/regroup stages."""
    lines = web.select(
        "doc_id", F.posexplode(F.split("web_text", "\n")).alias("pos", "para")
    ).withColumn("k", F.md5("para"))
    first = lines.groupBy("k").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    marked = lines.join(first, "k").withColumn(
        "keep",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")),
    )
    kept_structs = F.array_sort(
        F.collect_list(F.when(F.col("keep"), F.struct("pos", "para")))
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_paras"),
        F.sum(F.col("keep").cast("int")).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(kept_structs, lambda s: s["para"]), "\n"
        ).alias("dedup_text"),
    )


def sql_paragraph_dedup(table: str = "documents") -> str:
    return f"""
WITH synth AS ({sql_synthesize_web(table)}),
lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(web_text, chr(10)), 1) - 1 AS pos,
         unnest(string_split(web_text, chr(10))) AS para
  FROM synth
),
ranked AS (
  SELECT doc_id, pos, para,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
  FROM lines
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_paras,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, chr(10) ORDER BY pos), '')
         AS dedup_text
FROM ranked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# token-budget mixture sampling (the corpus-mixing pass of a training run:
# per-language weights + a global token budget -> per-language keep rates)
# ---------------------------------------------------------------------------

MIX_WEIGHTS = {"en": 4, "de": 2, "es": 2, "fr": 2, "zh": 1}
MIX_DEFAULT_W = 1
MIX_BUDGET_PCT = 50  # global budget: half the corpus tokens


def _mix_rates(documents: DataFrame, weights, default_w, budget_pct):
    """(lang, toks_lang, target_tokens, rate_pm) — one tiny relation, one
    census shuffle. All integer arithmetic: rate is per-mille via `div`,
    exact headroom T * 1000 < 2^63 (T < 9.2 * 10^15 corpus tokens, ~37 PB
    of text — documented dial past that: drop to per-cent granularity)."""
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    w = F.lit(default_w)
    for lang, wt in sorted(weights.items()):
        w = F.when(F.col("lang") == lang, F.lit(wt)).otherwise(w)
    census = (
        documents.select(F.col("lang").cast("string").alias("lang"), toks.alias("t"), w.alias("w"))
        .groupBy("lang")
        .agg(F.sum("t").alias("toks_lang"), F.first("w").alias("w"))
    )
    total = census.agg(F.sum("toks_lang").alias("_mix_t"))
    # census and total are both tiny (language-space-sized / 1 row): the
    # cross join is a BroadcastNestedLoopJoin over K rows, no hard hint
    return census.crossJoin(total).select(
        "lang",
        "toks_lang",
        F.expr(
            f"(((_mix_t * {int(budget_pct)}) div 100) * w) div {int(sum(weights.values()))}"
        ).alias("target_tokens"),
        F.least(
            F.lit(1000).cast("long"),
            F.expr(
                f"((((_mix_t * {int(budget_pct)}) div 100) * w) div {int(sum(weights.values()))} * 1000) div toks_lang"
            ),
        )
        .cast("int")
        .alias("rate_pm"),
    )


def mixture_sample(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    default_w: int = MIX_DEFAULT_W,
    budget_pct: int = MIX_BUDGET_PCT,
) -> DataFrame:
    """(doc_id, lang, n_tokens, rate_pm) — deterministic token-budget
    mixture sampling: a global token budget (budget_pct of corpus tokens)
    is split across languages by weight, each language's keep rate is its
    target over its actual tokens (capped at 1000 per-mille — a language
    under its target keeps everything), and the per-document cut is the
    same nested md5 bucket as hash_sample (reproducible across runs,
    retries, cluster sizes; raising the budget yields a superset).

    100 TB shape: ONE tiny census shuffle (languages x partial sums,
    map-side combine), then a narrow join of the corpus against the
    language-space-sized rate table (AQE broadcasts it at runtime — no
    hard hint needed) and a stateless filter. The corpus is never
    regrouped."""
    weights = MIX_WEIGHTS if weights is None else weights
    rates = _mix_rates(documents, weights, default_w, budget_pct)
    doc_id = F.col("doc_id").cast("string")
    bucket = (_hx(F.md5(F.concat(F.lit("mix|"), doc_id)), 1, 5) % 1000).cast("int")
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    return (
        documents.select(
            doc_id.alias("doc_id"),
            F.col("lang").cast("string").alias("lang"),
            toks.alias("n_tokens"),
            bucket.alias("bucket_pm"),
        )
        .join(rates.select("lang", "rate_pm"), "lang")
        .filter(F.col("bucket_pm") < F.col("rate_pm"))
        .select("doc_id", "lang", "n_tokens", "rate_pm")
    )


def mixture_audit(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    default_w: int = MIX_DEFAULT_W,
    budget_pct: int = MIX_BUDGET_PCT,
) -> DataFrame:
    """(lang, toks_lang, target_tokens, rate_pm, achieved_tokens,
    n_docs_kept) — the per-language budget report next to what the cut
    actually achieved (hash sampling is exact in expectation, not per
    draw; the audit is what a pipeline operator alarms on)."""
    weights = MIX_WEIGHTS if weights is None else weights
    rates = _mix_rates(documents, weights, default_w, budget_pct)
    kept = (
        mixture_sample(documents, weights, default_w, budget_pct)
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("achieved_tokens"),
            F.count(F.lit(1)).alias("n_docs_kept"),
        )
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "toks_lang",
        "target_tokens",
        "rate_pm",
        F.coalesce("achieved_tokens", F.lit(0)).cast("long").alias("achieved_tokens"),
        F.coalesce("n_docs_kept", F.lit(0)).cast("long").alias("n_docs_kept"),
    )


def _sql_mix_rates(table, weights, default_w, budget_pct) -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {wt}" for lang, wt in sorted(weights.items())
    )
    w_sum = int(sum(weights.values()))
    return f"""
census AS (
  SELECT CAST(lang AS VARCHAR) AS lang,
         CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT)
           AS toks_lang,
         (CASE {whens} ELSE {default_w} END) AS w
  FROM {table} GROUP BY lang, (CASE {whens} ELSE {default_w} END)
),
total AS (SELECT SUM(toks_lang) AS t FROM census),
rates AS (
  SELECT lang, toks_lang,
         CAST((((t * {int(budget_pct)}) // 100) * w) // {w_sum} AS BIGINT)
           AS target_tokens,
         CAST(LEAST(1000, ((((t * {int(budget_pct)}) // 100) * w) // {w_sum} * 1000)
                          // toks_lang) AS INT) AS rate_pm
  FROM census CROSS JOIN total
)"""


def sql_mixture_sample(
    table: str = "documents",
    weights: dict[str, int] | None = None,
    default_w: int = MIX_DEFAULT_W,
    budget_pct: int = MIX_BUDGET_PCT,
) -> str:
    weights = MIX_WEIGHTS if weights is None else weights
    h = "md5('mix|' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH {_sql_mix_rates(table, weights, default_w, budget_pct)}
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, CAST(d.lang AS VARCHAR) AS lang,
       CAST(len(list_filter(string_split(d.text, ' '), w -> w <> '')) AS BIGINT)
         AS n_tokens,
       r.rate_pm
FROM {table} d JOIN rates r ON CAST(d.lang AS VARCHAR) = r.lang
WHERE {_sql_hx(h, 1, 5)} % 1000 < r.rate_pm
"""


def sql_mixture_audit(
    table: str = "documents",
    weights: dict[str, int] | None = None,
    default_w: int = MIX_DEFAULT_W,
    budget_pct: int = MIX_BUDGET_PCT,
) -> str:
    weights = MIX_WEIGHTS if weights is None else weights
    return f"""
WITH {_sql_mix_rates(table, weights, default_w, budget_pct)},
kept AS (
  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS achieved_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_docs_kept
  FROM ({sql_mixture_sample(table, weights, default_w, budget_pct)})
  GROUP BY lang
)
SELECT r.lang, r.toks_lang, r.target_tokens, r.rate_pm,
       COALESCE(k.achieved_tokens, 0) AS achieved_tokens,
       COALESCE(k.n_docs_kept, 0) AS n_docs_kept
FROM rates r LEFT JOIN kept k USING (lang)
"""


# ---------------------------------------------------------------------------
# per-domain quota (anti-domination cap)
# ---------------------------------------------------------------------------

DOMAIN_CAP = 4  # sandbox cap; the production dial (docs kept per domain)
RE_HOST = r"https?://([A-Za-z0-9._-]+)"


def domain_cap(documents: DataFrame, cap: int = DOMAIN_CAP) -> DataFrame:
    """(doc_id, domain, rank_in_domain) — keep at most `cap` docs per
    registrable domain (C4/RefinedWeb's anti-domination rule: without it a
    handful of mega-sites dominate the training mix). domain = host of the
    doc's first URL in the synthesized web text; docs with no URL fall into
    the '(none)' stratum and are capped under that key like any other.

    Priority inside a domain is md5('domcap|' || doc_id) — deterministic
    across runs/retries/cluster sizes, and nested: cap=K's survivors are a
    strict prefix of cap=K+1's (seeded-rand top-k is neither).

    Scale shape: ONE shuffle on the domain key. The rank<=cap filter over
    row_number() is recognized by Spark 3.5+'s WindowGroupLimit rule, which
    inserts a map-side partial top-`cap` per domain BEFORE the exchange —
    a mega-domain ships only cap rows per map task instead of its whole
    partition's rows, so domain skew is bounded at the source (asserted on
    the physical plan in tests/test_domain_cap.py)."""
    web = synthesize_web(documents)
    doc_id = F.col("doc_id").cast("string")
    host = F.regexp_extract("web_text", RE_HOST, 1)
    pr = F.md5(F.concat(F.lit("domcap|"), doc_id))
    ranked = web.select(
        doc_id.alias("doc_id"),
        F.when(host == "", F.lit("(none)")).otherwise(host).alias("domain"),
        pr.alias("pr"),
    ).withColumn(
        "rank_in_domain",
        F.row_number()
        .over(Window.partitionBy("domain").orderBy("pr", "doc_id"))
        .cast("int"),
    )
    return ranked.filter(F.col("rank_in_domain") <= cap).select(
        "doc_id", "domain", "rank_in_domain"
    )


def sql_domain_cap(table: str = "documents", cap: int = DOMAIN_CAP) -> str:
    return f"""
WITH synth AS ({sql_synthesize_web(table)}),
d AS (
  SELECT doc_id,
         COALESCE(NULLIF(regexp_extract(web_text, '{RE_HOST}', 1), ''), '(none)') AS domain,
         md5('domcap|' || doc_id) AS pr
  FROM synth
)
SELECT doc_id, domain,
       CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY pr, doc_id) AS INT)
         AS rank_in_domain
FROM d QUALIFY rank_in_domain <= {cap}
"""


# ---------------------------------------------------------------------------
# C4 line/doc filters (Raffel et al. 2020, "Colossal Clean Crawled Corpus" §2.2)
# ---------------------------------------------------------------------------

C4_MIN_LINE_WORDS = 5   # C4: "retained lines that contained at least 5 words"
C4_MIN_KEPT_LINES = 3   # C4: "discarded any page with fewer than 3 sentences"
C4_TERMINALS = (".", "!", "?", '"')  # C4's terminal punctuation set


def synthesize_c4(documents: DataFrame) -> DataFrame:
    """(doc_id, web_text, n_lines) — the synthesize_web page with C4 filter
    signals planted deterministically so every rule fires on a known subset:
    ~2/3 of lines get a terminal '.', ~1/7 are poisoned with a leading
    'javascript', doc_id%17 docs get a 'Lorem ipsum' line, doc_id%19 docs a
    curly-brace code line. Same md5 schedule on both engines."""
    web = synthesize_web(documents).select(
        "doc_id", F.split("web_text", "\n").alias("ls")
    )

    def _mut(i):
        hl = F.md5(F.concat(F.lit("c4|"), F.col("doc_id"), F.lit("|"), i.cast("string")))
        base = F.element_at(F.col("ls"), i)
        poisoned = F.when(
            _hx(hl, 3, 2) % 7 == 0, F.concat(F.lit("javascript "), base)
        ).otherwise(base)
        return F.when(
            _hx(hl, 1, 2) % 3 != 0, F.concat(poisoned, F.lit("."))
        ).otherwise(poisoned)

    mut = F.transform(F.sequence(F.lit(1), F.size("ls")), _mut)
    empty = F.array().cast("array<string>")
    did = F.col("doc_id").cast("long")
    lorem = F.when(
        did % 17 == 0, F.array(F.lit("Lorem ipsum dolor sit amet."))
    ).otherwise(empty)
    brace = F.when(
        did % 19 == 0, F.array(F.lit("function f() { return 1; }"))
    ).otherwise(empty)
    lines = F.concat(mut, lorem, brace)
    return web.select(
        "doc_id",
        F.array_join(lines, "\n").alias("web_text"),
        F.size(lines).cast("int").alias("n_lines"),
    )


def c4_filters(web: DataFrame) -> DataFrame:
    """C4 cleaning over (doc_id, web_text): keep a line iff it ends in
    terminal punctuation AND has >= 5 words AND does not mention
    'javascript'; keep the doc iff it has no 'lorem ipsum', no '{', and
    >= 3 surviving lines. Output (doc_id, n_lines, n_kept_lines,
    has_lorem_ipsum, has_brace, keep_doc, text_c4).

    100 TB shape: one narrow Project — pure Column string/array work, zero
    shuffle, zero Python; filters compose with the census-based boilerplate
    strip upstream (this is the static-rule half, that is the
    corpus-frequency half)."""
    ls = web.select("doc_id", F.col("web_text"), F.split("web_text", "\n").alias("ls"))
    kept = F.filter(
        F.col("ls"),
        lambda x: F.substring(x, -1, 1).isin(*C4_TERMINALS)
        & (F.size(F.filter(F.split(x, " "), lambda t: t != "")) >= C4_MIN_LINE_WORDS)
        & ~F.contains(F.lower(x), F.lit("javascript")),
    )
    out = ls.select(
        "doc_id",
        F.size("ls").cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        F.contains(F.lower("web_text"), F.lit("lorem ipsum")).alias("has_lorem_ipsum"),
        F.contains("web_text", F.lit("{")).alias("has_brace"),
        F.array_join(kept, "\n").alias("text_c4"),
    )
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "has_lorem_ipsum",
        "has_brace",
        (
            ~F.col("has_lorem_ipsum")
            & ~F.col("has_brace")
            & (F.col("n_kept_lines") >= C4_MIN_KEPT_LINES)
        ).alias("keep_doc"),
        "text_c4",
    )


def sql_synthesize_c4(table: str = "documents") -> str:
    hl = "md5('c4|' || doc_id || '|' || CAST(i AS VARCHAR))"
    inner = (
        f"CASE WHEN {_sql_hx(hl, 3, 2)} % 7 = 0 "
        f"THEN 'javascript ' || ls[CAST(i AS BIGINT)] ELSE ls[CAST(i AS BIGINT)] END"
    )
    mut = (
        f"list_transform(range(1, len(ls) + 1), i -> "
        f"CASE WHEN {_sql_hx(hl, 1, 2)} % 3 != 0 THEN ({inner}) || '.' ELSE ({inner}) END)"
    )
    lines = (
        f"({mut} "
        f"|| CASE WHEN CAST(doc_id AS BIGINT) % 17 = 0 "
        f"THEN ['Lorem ipsum dolor sit amet.'] ELSE CAST([] AS VARCHAR[]) END "
        f"|| CASE WHEN CAST(doc_id AS BIGINT) % 19 = 0 "
        f"THEN ['function f() {{ return 1; }}'] ELSE CAST([] AS VARCHAR[]) END)"
    )
    return f"""
WITH w AS ({sql_synthesize_web(table)}),
l AS (SELECT doc_id, string_split(web_text, chr(10)) AS ls FROM w)
SELECT doc_id,
       array_to_string({lines}, chr(10)) AS web_text,
       CAST(len({lines}) AS INT) AS n_lines
FROM l
"""


def sql_c4_filters(table: str = "documents") -> str:
    terms = ", ".join(f"'{t}'" if t != '"' else "'\"'" for t in C4_TERMINALS)
    keep_line = (
        f"x -> substr(x, -1, 1) IN ({terms}) "
        f"AND len(list_filter(string_split(x, ' '), t -> t <> '')) >= {C4_MIN_LINE_WORDS} "
        f"AND NOT contains(lower(x), 'javascript')"
    )
    return f"""
WITH c4 AS ({sql_synthesize_c4(table)}),
l AS (
  SELECT doc_id, web_text, string_split(web_text, chr(10)) AS ls FROM c4
),
k AS (
  SELECT doc_id, web_text, CAST(len(ls) AS INT) AS n_lines,
         list_filter(ls, {keep_line}) AS kept
  FROM l
)
SELECT doc_id, n_lines, CAST(len(kept) AS INT) AS n_kept_lines,
       contains(lower(web_text), 'lorem ipsum') AS has_lorem_ipsum,
       contains(web_text, '{{') AS has_brace,
       (NOT contains(lower(web_text), 'lorem ipsum')
        AND NOT contains(web_text, '{{')
        AND len(kept) >= {C4_MIN_KEPT_LINES}) AS keep_doc,
       COALESCE(array_to_string(kept, chr(10)), '') AS text_c4
FROM k
"""


# ---------------------------------------------------------------------------
# encoding hygiene (ftfy-lite: mojibake repair + replacement/control strip)
# ---------------------------------------------------------------------------
# The fix-encoding pass every crawl pipeline runs before filtering (ftfy /
# CCNet's "fix unicode" step): repair the classic UTF-8-decoded-as-Latin-1
# mojibake sequences, count and strip U+FFFD replacement characters and C0
# control bytes, and gate documents whose replacement-char density says the
# underlying bytes are unrecoverable. Fix table is the two highest-frequency
# mojibake digraphs (the production swap-in is the full ftfy table — same
# chained-replace plan, more entries).

MOJI_APOS = "â€™"   # 'a-circ euro tm' — mojibake of U+2019 right quote
MOJI_EACUTE = "Ã©"       # 'A-tilde copyright-9' — mojibake of U+00E9 e-acute
REPL_CHAR = "�"               # U+FFFD replacement character
CTRL_BELL = "\x07"                 # C0 control representative (BEL)
ENC_MAX_REPL_PERMILLE = 20         # gate: >2% replacement chars = dead bytes


def synthesize_encoding(documents: DataFrame) -> DataFrame:
    """(doc_id, enc_text) — the document text with encoding damage planted
    deterministically: doc_id%5==0 docs get a mojibake prefix (apostrophe +
    e-acute digraphs), doc_id%7==0 a replacement-char suffix, doc_id%11==0
    a BEL control char. Same arithmetic schedule in the DuckDB mirror."""
    did = F.col("doc_id").cast("long")
    pre = F.when(
        did % 5 == 0,
        F.lit("it" + MOJI_APOS + "s the caf" + MOJI_EACUTE + " "),
    ).otherwise(F.lit(""))
    tail = F.when(
        did % 7 == 0, F.lit(" tail" + REPL_CHAR + REPL_CHAR + "bytes")
    ).otherwise(F.lit(""))
    bell = F.when(did % 11 == 0, F.lit(CTRL_BELL)).otherwise(F.lit(""))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(pre, bell, F.col("text"), tail).alias("enc_text"),
    )


def _count_occ(col, pat: str):
    """Occurrences of a fixed pattern, by codepoint-length delta (exact on
    both engines: length() counts codepoints in Spark and DuckDB)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit("")))) / len(pat)
    ).cast("int")


def encoding_fix(enc: DataFrame) -> DataFrame:
    """(doc_id, n_mojibake, n_repl, n_ctrl, repl_per_mille, keep_doc,
    text_fixed) over (doc_id, enc_text): chained fixed-string replaces
    repair the mojibake digraphs, replacement/control chars are stripped,
    and the doc is gated on replacement-char density.

    100 TB shape: ONE narrow Project — pure Column string algebra, zero
    shuffle, zero Python; chained replace stays inside whole-stage codegen
    and composes with the C4/boilerplate passes on the same scan."""
    t = F.col("enc_text")
    n_moji = _count_occ(t, MOJI_APOS) + _count_occ(t, MOJI_EACUTE)
    fixed = F.replace(
        F.replace(t, F.lit(MOJI_APOS), F.lit("’")),
        F.lit(MOJI_EACUTE), F.lit("é"),
    )
    fixed = F.replace(
        F.replace(fixed, F.lit(REPL_CHAR), F.lit("")), F.lit(CTRL_BELL), F.lit("")
    )
    n_repl_raw = F.length(t) - F.length(F.replace(t, F.lit(REPL_CHAR), F.lit("")))
    base = enc.select(
        "doc_id",
        n_moji.cast("int").alias("n_mojibake"),
        _count_occ(t, REPL_CHAR).alias("n_repl"),
        _count_occ(t, CTRL_BELL).alias("n_ctrl"),
        ((n_repl_raw * 1000).cast("long") / F.length(t))
        .cast("int")
        .alias("repl_per_mille"),
        fixed.alias("text_fixed"),
    )
    return base.select(
        "doc_id", "n_mojibake", "n_repl", "n_ctrl", "repl_per_mille",
        (F.col("repl_per_mille") <= ENC_MAX_REPL_PERMILLE).alias("keep_doc"),
        "text_fixed",
    )


def sql_synthesize_encoding(table: str = "documents") -> str:
    pre = f"it{MOJI_APOS}s the caf{MOJI_EACUTE} "
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       (CASE WHEN CAST(doc_id AS BIGINT) % 5 = 0 THEN '{pre}' ELSE '' END)
       || (CASE WHEN CAST(doc_id AS BIGINT) % 11 = 0 THEN chr(7) ELSE '' END)
       || text
       || (CASE WHEN CAST(doc_id AS BIGINT) % 7 = 0
           THEN ' tail' || chr(65533) || chr(65533) || 'bytes' ELSE '' END)
       AS enc_text
FROM {table}
"""


def sql_encoding_fix(table: str = "documents") -> str:
    def occ(pat_sql: str, plen: int) -> str:
        return f"((length(t) - length(replace(t, {pat_sql}, ''))) // {plen})"

    apos = f"'{MOJI_APOS}'"
    eac = f"'{MOJI_EACUTE}'"
    repl = "chr(65533)"
    bell = "chr(7)"
    fixed = (
        f"replace(replace(replace(replace(t, {apos}, chr(8217)), {eac}, chr(233)), "
        f"{repl}, ''), {bell}, '')"
    )
    return f"""
WITH e AS (SELECT doc_id, enc_text AS t FROM ({sql_synthesize_encoding(table)}))
SELECT doc_id,
       CAST({occ(apos, 3)} + {occ(eac, 2)} AS INT) AS n_mojibake,
       CAST({occ(repl, 1)} AS INT) AS n_repl,
       CAST({occ(bell, 1)} AS INT) AS n_ctrl,
       CAST((1000 * (length(t) - length(replace(t, {repl}, '')))) // length(t) AS INT)
         AS repl_per_mille,
       ((1000 * (length(t) - length(replace(t, {repl}, '')))) // length(t))
         <= {ENC_MAX_REPL_PERMILLE} AS keep_doc,
       {fixed} AS text_fixed
FROM e
"""


# ---------------------------------------------------------------------------
# badword document filter (C4 §2.2 blocklist rule)
# ---------------------------------------------------------------------------
# C4 removes any page containing a word from a public blocklist (the
# "List of Dirty, Naughty, Obscene..." word list). The list itself is
# swappable content, not engine: this uses a three-entry PLACEHOLDER list of
# made-up tokens (the production swap-in is the full LDNOOBW list as the same
# array literal — Catalyst compiles isin over a few hundred entries fine).

BADWORDS = ("darnscale", "heckish", "fragglenark")


def synthesize_badwords(documents: DataFrame) -> DataFrame:
    """(doc_id, bw_text): doc_id%13==0 docs get ' darnscale', %23==0 get
    ' heckish glop' appended — both rules fire on known subsets; 'class'
    style substring traps stay absent by construction."""
    did = F.col("doc_id").cast("long")
    s1 = F.when(did % 13 == 0, F.lit(" " + BADWORDS[0])).otherwise(F.lit(""))
    s2 = F.when(did % 23 == 0, F.lit(" " + BADWORDS[1] + " glop")).otherwise(F.lit(""))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.col("text"), s1, s2).alias("bw_text"),
    )


def badwords_filter(bw: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_bad_tokens, has_badword, keep_doc) over
    (doc_id, bw_text): token-membership match against the blocklist
    (C4 matches words, not substrings — 'class' must not trip 'ass').

    100 TB shape: ONE narrow Project, zero shuffle, zero Python."""
    toks = F.filter(F.split(F.lower("bw_text"), " "), lambda w: w != "")
    n_bad = F.size(F.filter(toks, lambda w: w.isin(*BADWORDS)))
    return bw.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        n_bad.cast("int").alias("n_bad_tokens"),
        (n_bad > 0).alias("has_badword"),
        (n_bad == 0).alias("keep_doc"),
    )


def sql_badwords_filter(table: str = "documents") -> str:
    inl = ", ".join(f"'{w}'" for w in BADWORDS)
    return f"""
WITH b AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         text
         || (CASE WHEN CAST(doc_id AS BIGINT) % 13 = 0 THEN ' {BADWORDS[0]}' ELSE '' END)
         || (CASE WHEN CAST(doc_id AS BIGINT) % 23 = 0 THEN ' {BADWORDS[1]} glop' ELSE '' END)
         AS bw_text
  FROM {table}
),
t AS (
  SELECT doc_id,
         list_filter(string_split(lower(bw_text), ' '), w -> w <> '') AS ts
  FROM b
)
SELECT doc_id,
       CAST(len(ts) AS INT) AS n_tokens,
       CAST(len(list_filter(ts, w -> w IN ({inl}))) AS INT) AS n_bad_tokens,
       len(list_filter(ts, w -> w IN ({inl}))) > 0 AS has_badword,
       len(list_filter(ts, w -> w IN ({inl}))) = 0 AS keep_doc
FROM t
"""


# ---------------------------------------------------------------------------
# epoch-salted global shuffle (training-order assignment)
# ---------------------------------------------------------------------------
# The final step before a corpus is consumed for training: assign every
# document a reproducible random position, re-randomized per epoch. Shard
# assignment and intra-shard order both derive from md5('shuf|epoch|doc'),
# so the order is stable across reruns, independent of input partitioning,
# and changes completely between epochs — no rand(), no global sort.

SHUF_SHARDS = 64  # sandbox dial; production = corpus_size / shard_size


def epoch_shuffle(
    documents: DataFrame, epoch: int = 0, n_shards: int = SHUF_SHARDS
) -> DataFrame:
    """(doc_id, shard, pos) — training order for one epoch: shard =
    md5-bucket, pos = rank of the md5 within the shard.

    100 TB shape: ONE shuffle onto the shard key + a per-shard sort
    (window row_number) — never a global sort. Shard sizes are md5-uniform
    (~n/S), so n_shards is the skew/memory dial: production sets S =
    corpus/shard_size and writes one sorted file per shard, which is
    exactly the layout a training loader wants to read sequentially."""
    h = F.md5(
        F.concat(
            F.lit("shuf|"), F.lit(str(epoch)), F.lit("|"),
            F.col("doc_id").cast("string"),
        )
    )
    base = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards)
        .cast("int")
        .alias("shard"),
        h.alias("h"),
    )
    win = Window.partitionBy("shard").orderBy("h", "doc_id")
    return base.select(
        "doc_id", "shard", F.row_number().over(win).cast("int").alias("pos")
    )


def sql_epoch_shuffle(
    table: str = "documents", epoch: int = 0, n_shards: int = SHUF_SHARDS
) -> str:
    h = f"md5('shuf|{epoch}|' || CAST(doc_id AS VARCHAR))"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST((('0x' || substr({h}, 1, 4))::BIGINT % {n_shards}) AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY ('0x' || substr({h}, 1, 4))::BIGINT % {n_shards}
         ORDER BY {h}, CAST(doc_id AS VARCHAR)) AS INT) AS pos
FROM {table}
"""


# ---------------------------------------------------------------------------
# URL canonicalization + dedup-by-URL (the crawl pipeline's first dedup)
# ---------------------------------------------------------------------------
# CCNet/C4 dedup by URL before ever touching content: canonicalize
# (scheme/www/fragment/tracking-query/trailing-slash) and keep one doc per
# canonical URL. The canonical chain here is regex rules whose semantics
# are identical in Spark (Java regex) and DuckDB (RE2): scheme strip, www
# strip, fragment strip, utm-query strip (the synthesized corpus only
# emits tracking params as a whole query; a production pipeline swaps in a
# param-level parser under the same keeper kernel), trailing-slash strip.


def synthesize_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, url) — a deterministic crawl-frontier: docs in groups of 5
    share a base URL; variants 0-3 (plain / http+www+slash / utm query /
    fragment) canonicalize to the SAME key, variant 4 carries a real query
    param and stays distinct."""
    did = F.col("doc_id").cast("long")
    base = F.concat(
        F.lit("site"), (did / 5).cast("long").cast("string"),
        F.lit(".org/a/p"), (did / 50).cast("long").cast("string"),
    )
    v = did % 5
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), base))
        .when(v == 1, F.concat(F.lit("http://www."), base, F.lit("/")))
        .when(v == 2, F.concat(F.lit("https://"), base,
                               F.lit("?utm_source=feed&utm_campaign=c1")))
        .when(v == 3, F.concat(F.lit("https://"), base, F.lit("#section-2")))
        .otherwise(F.concat(F.lit("https://"), base, F.lit("?id=7")))
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), url.alias("url")
    )


def _canonical_url(col: Column) -> Column:
    c = F.regexp_replace(col, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"\?utm_[^#]*$", "")
    return F.regexp_replace(c, r"/$", "")


def url_dedup(urls: DataFrame) -> DataFrame:
    """(doc_id, url, canonical, keeper_doc, is_keeper) over (doc_id, url).

    100 TB shape: canonicalization is a narrow Project; the keeper is ONE
    window min on the canonical key (no join back — the census and the
    per-doc rows share the shuffle). Canonical-key skew (one viral URL
    crawled millions of times) stays safe: the window computes only min,
    which Spark evaluates without buffering the partition (running
    aggregate over the sorted run)."""
    base = urls.select(
        "doc_id", "url", _canonical_url(F.col("url")).alias("canonical")
    )
    w = Window.partitionBy("canonical")
    keeper = F.min(F.col("doc_id").cast("long")).over(w)
    return base.select(
        "doc_id", "url", "canonical",
        keeper.cast("long").alias("keeper_doc"),
        (F.col("doc_id").cast("long") == keeper).alias("is_keeper"),
    )


def sql_url_dedup(table: str = "documents") -> str:
    did = "CAST(doc_id AS BIGINT)"
    base = (
        f"'site' || CAST({did} // 5 AS VARCHAR) || '.org/a/p' "
        f"|| CAST({did} // 50 AS VARCHAR)"
    )
    return f"""
WITH u AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE CAST(doc_id AS BIGINT) % 5
           WHEN 0 THEN 'https://' || {base}
           WHEN 1 THEN 'http://www.' || {base} || '/'
           WHEN 2 THEN 'https://' || {base} || '?utm_source=feed&utm_campaign=c1'
           WHEN 3 THEN 'https://' || {base} || '#section-2'
           ELSE 'https://' || {base} || '?id=7'
         END AS url
  FROM {table}
),
c AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(url, '^https?://', ''), '^www\\.', ''),
           '#.*$', ''), '\\?utm_[^#]*$', ''), '/$', '') AS canonical
  FROM u
)
SELECT doc_id, url, canonical,
       CAST(MIN(CAST(doc_id AS BIGINT)) OVER (PARTITION BY canonical) AS BIGINT)
         AS keeper_doc,
       CAST(doc_id AS BIGINT) = MIN(CAST(doc_id AS BIGINT)) OVER (PARTITION BY canonical)
         AS is_keeper
FROM c
"""


# ---------------------------------------------------------------------------
# param-level URL canonicalization (the production swap-in for url_dedup)
# ---------------------------------------------------------------------------
# The regex chain above handles whole-query tracking strings; real crawls
# carry tracking params ANYWHERE in the query and equivalent URLs with
# reordered params. This canonicalizer parses the query into params, drops
# the tracking ones wherever they sit, sorts the rest (param order is not
# semantic), and reassembles — still pure Column algebra, zero shuffle.

TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid)="


def synthesize_urls_messy(documents: DataFrame) -> DataFrame:
    """(doc_id, url) — frontier with param-level noise: groups of 5 share a
    base; variants 0-3 (sorted / reordered / tracking-in-middle /
    fragment) canonicalize together, variant 4 changes a param VALUE and
    stays distinct."""
    did = F.col("doc_id").cast("long")
    base = F.concat(
        F.lit("https://shop"), (did / 5).cast("long").cast("string"),
        F.lit(".example/item"),
    )
    v = did % 5
    url = (
        F.when(v == 0, F.concat(base, F.lit("?a=1&b=2")))
        .when(v == 1, F.concat(base, F.lit("?b=2&a=1")))
        .when(v == 2, F.concat(base, F.lit("?a=1&utm_source=x&b=2")))
        .when(v == 3, F.concat(base, F.lit("?b=2&a=1#frag")))
        .otherwise(F.concat(base, F.lit("?a=1&b=3")))
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), url.alias("url")
    )


def _canonical_url_params(col: Column) -> Column:
    u = F.regexp_replace(col, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")
    path = F.regexp_replace(F.regexp_extract(u, r"^([^?]*)", 1), r"/$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(F.size(params) > 0, F.concat(path, F.lit("?"), F.array_join(params, "&"))).otherwise(path)


def url_dedup_params(urls: DataFrame) -> DataFrame:
    """(doc_id, url, canonical, keeper_doc, is_keeper) — the url_dedup
    keeper kernel (ONE window-min shuffle) under the param-level
    canonicalizer: tracking params dropped anywhere in the query,
    remaining params sorted (order is not semantic)."""
    base = urls.select(
        "doc_id", "url", _canonical_url_params(F.col("url")).alias("canonical")
    )
    w = Window.partitionBy("canonical")
    keeper = F.min(F.col("doc_id").cast("long")).over(w)
    return base.select(
        "doc_id", "url", "canonical",
        keeper.cast("long").alias("keeper_doc"),
        (F.col("doc_id").cast("long") == keeper).alias("is_keeper"),
    )


def sql_url_dedup_params(table: str = "documents") -> str:
    did = "CAST(doc_id AS BIGINT)"
    base = f"'https://shop' || CAST({did} // 5 AS VARCHAR) || '.example/item'"
    canon = (
        "CASE WHEN len(ps) > 0 "
        "THEN path || '?' || array_to_string(ps, '&') ELSE path END"
    )
    return f"""
WITH u AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE CAST(doc_id AS BIGINT) % 5
           WHEN 0 THEN {base} || '?a=1&b=2'
           WHEN 1 THEN {base} || '?b=2&a=1'
           WHEN 2 THEN {base} || '?a=1&utm_source=x&b=2'
           WHEN 3 THEN {base} || '?b=2&a=1#frag'
           ELSE {base} || '?a=1&b=3'
         END AS url
  FROM {table}
),
s AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(regexp_replace(url,
           '^https?://', ''), '^www\\.', ''), '#.*$', '') AS stripped
  FROM u
),
p AS (
  SELECT doc_id, url,
         regexp_replace(regexp_extract(stripped, '^([^?]*)', 1), '/$', '') AS path,
         list_sort(list_filter(
           string_split(regexp_extract(stripped, '\\?(.*)$', 1), '&'),
           q -> q <> '' AND NOT regexp_matches(q, '{TRACKING_PARAM_RE}')
         )) AS ps
  FROM s
)
SELECT doc_id, url, {canon} AS canonical,
       CAST(MIN(CAST(doc_id AS BIGINT)) OVER (PARTITION BY {canon}) AS BIGINT)
         AS keeper_doc,
       CAST(doc_id AS BIGINT) = MIN(CAST(doc_id AS BIGINT)) OVER (PARTITION BY {canon})
         AS is_keeper
FROM p
"""


# ---------------------------------------------------------------------------
# URL blocklist filtering (RefinedWeb, Penedo et al. 2023 §3.1.1): a HARD
# registered-domain blocklist (theirs: the UT1 4.6M-domain list) plus a
# SOFT URL-keyword score (weighted spam words anywhere in the URL path;
# a doc is dropped when the summed weight crosses the gate). Both rules
# are pure Column algebra over the frontier row — zero shuffle, the ideal
# 100 TB shape (the gate runs inside the crawl scan).
#
# Production dial: the literal domain tuple below stands in for the UT1
# list; at 4.6M entries the membership test becomes a broadcast (a few
# hundred MB) or, past executor memory, a bucketed shuffle join on the
# registered-domain key — the incremental-dedup history-side precedent.
# The soft keyword list is a few hundred entries in production and stays
# a literal expression either way.

URL_BLOCKED_DOMAINS = ("tracker-farm.biz", "casino-hub.example")
URL_SOFT_WEIGHTS = (
    ("casino", 500),
    ("poker", 400),
    ("pills", 350),
    ("replica", 250),
)
URL_SCORE_GATE = 500  # milli-units; drop when summed keyword weight >= gate


def synthesize_url_frontier(documents: DataFrame) -> DataFrame:
    """(doc_id, url) — a deterministic frontier with planted structure:
    an md5 schedule sends ~2/10 docs to blocked domains and draws 0-2 soft
    spam keywords into the path, so every rule fires on the fixture."""
    did = F.col("doc_id").cast("string")
    b = F.conv(F.substring(F.md5(F.concat(F.lit("urlf|"), did)), 1, 4), 16, 10) % 10
    b2 = F.conv(F.substring(F.md5(F.concat(F.lit("urlf|"), did)), 5, 4), 16, 10) % 8
    b3 = F.conv(F.substring(F.md5(F.concat(F.lit("urlf|"), did)), 9, 4), 16, 10) % 8
    host = (
        F.when(b == 0, F.lit("ads.tracker-farm.biz"))
        .when(b == 1, F.lit("www.casino-hub.example"))
        .otherwise(
            F.concat(F.lit("site"), (F.col("doc_id").cast("long") / 7).cast("long").cast("string"), F.lit(".org"))
        )
    )
    w1 = (
        F.when(b2 == 0, F.lit("casino"))
        .when(b2 == 1, F.lit("poker"))
        .when(b2 == 2, F.lit("pills"))
        .when(b2 == 3, F.lit("replica"))
        .otherwise(F.lit("article"))
    )
    w2 = F.when(b3 == 0, F.lit("poker")).otherwise(F.lit("page"))
    url = F.concat(
        F.lit("https://"), host, F.lit("/p/"), w1, F.lit("-"), w2,
        F.lit("/"), did,
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), url.alias("url")
    )


def url_blocklist_filter(urls: DataFrame) -> DataFrame:
    """(doc_id, url, host, domain_blocked, url_score_milli, kept) over a
    (doc_id, url) frontier: hard registered-domain block (exact or
    dot-suffix match after www-stripping) + soft keyword score over the
    lowercased path; kept = neither rule fires."""
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    base = urls.select(
        "doc_id",
        "url",
        F.regexp_replace(host, r"^www\.", "").alias("host"),
        F.lower(F.regexp_extract("url", r"^https?://[^/]+(/.*)?$", 1)).alias("_path"),
    )
    blocked = F.lit(False)
    for d in URL_BLOCKED_DOMAINS:
        blocked = blocked | (F.col("host") == d) | F.col("host").endswith("." + d)
    score = sum(
        (F.when(F.expr(f"contains(_path, '{kw}')"), w).otherwise(0))
        for kw, w in URL_SOFT_WEIGHTS
    )
    return base.select(
        "doc_id",
        "url",
        "host",
        blocked.alias("domain_blocked"),
        score.cast("int").alias("url_score_milli"),
        (~blocked & (score < URL_SCORE_GATE)).alias("kept"),
    )


def sql_url_blocklist(table: str = "documents") -> str:
    """DuckDB mirror: identical md5 frontier synthesis + rule constants."""
    did = "CAST(doc_id AS VARCHAR)"
    b = f"(('0x' || substr(md5('urlf|' || {did}), 1, 4))::BIGINT % 10)"
    b2 = f"(('0x' || substr(md5('urlf|' || {did}), 5, 4))::BIGINT % 8)"
    b3 = f"(('0x' || substr(md5('urlf|' || {did}), 9, 4))::BIGINT % 8)"
    host = (
        f"CASE {b} WHEN 0 THEN 'ads.tracker-farm.biz' "
        f"WHEN 1 THEN 'www.casino-hub.example' "
        f"ELSE 'site' || CAST(CAST(doc_id AS BIGINT) // 7 AS VARCHAR) || '.org' END"
    )
    w1 = (
        f"CASE {b2} WHEN 0 THEN 'casino' WHEN 1 THEN 'poker' "
        f"WHEN 2 THEN 'pills' WHEN 3 THEN 'replica' ELSE 'article' END"
    )
    w2 = f"CASE {b3} WHEN 0 THEN 'poker' ELSE 'page' END"
    blocked = " OR ".join(
        f"(host = '{d}' OR host LIKE '%.{d}')" for d in URL_BLOCKED_DOMAINS
    )
    score = " + ".join(
        f"CASE WHEN contains(p, '{kw}') THEN {w} ELSE 0 END"
        for kw, w in URL_SOFT_WEIGHTS
    )
    return f"""
WITH u AS (
  SELECT {did} AS doc_id,
         'https://' || {host} || '/p/' || {w1} || '-' || {w2} || '/' || {did} AS url
  FROM {table}
),
h AS (
  SELECT doc_id, url,
         regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1),
                        '^www\\.', '') AS host,
         lower(regexp_extract(url, '^https?://[^/]+(/.*)$', 1)) AS p
  FROM u
)
SELECT doc_id, url, host,
       ({blocked}) AS domain_blocked,
       CAST({score} AS INT) AS url_score_milli,
       (NOT ({blocked}) AND ({score}) < {URL_SCORE_GATE}) AS kept
FROM h
"""


# ------------------------------------------------ intra-document line dedup
# Dolma/RedPajama's WITHIN-document repetition removal, next to the
# cross-document passes this module already carries: repeated lines inside
# one document (template chrome stamped per section, scraper double-renders)
# are dropped keeping the FIRST occurrence. Zero shuffle by construction —
# the whole operator is in-row array algebra, so it rides the extraction
# scan with no Exchange at any corpus size (plan-asserted).
#
# HOF-trap note (the winnowing lesson, PLANS.md): a
# filter(lines, (x, i) -> array_position(lines, x) = i) formulation
# references the derived `lines` array INSIDE the lambda — CollapseProject
# inlines the split there and interpreted HOF evaluation re-splits the text
# once per element. The fold below references `lines` exactly once
# (aggregate's input); the O(L^2) member checks compare short strings, not
# re-derive arrays.

IDD_PLANT_MOD = 3


def synthesize_intradoc(documents: DataFrame) -> DataFrame:
    """(doc_id, web_text) — synthesize_web plus the planted structure this
    operator exists for: ~1/IDD_PLANT_MOD of docs get their own first line
    stamped again at the end (the fixture's lines are otherwise unique
    within a doc)."""
    web = synthesize_web(documents).select("doc_id", "web_text")
    h = _hx(F.md5(F.concat(F.lit("idd|"), F.col("doc_id"))), 1, 4)
    first = F.element_at(F.split("web_text", "\n"), 1)
    return web.select(
        "doc_id",
        F.when(
            h % IDD_PLANT_MOD == 0,
            F.concat(F.col("web_text"), F.lit("\n"), first),
        )
        .otherwise(F.col("web_text"))
        .alias("web_text"),
    )


def intradoc_line_dedup(documents: DataFrame) -> DataFrame:
    """(doc_id, n_lines, n_dropped, clean_text) — repeated lines within a
    document dropped, first occurrence kept, order preserved."""
    web = synthesize_intradoc(documents)
    lines = F.split("web_text", "\n")
    kept = F.aggregate(
        lines,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return web.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_dropped"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def sql_intradoc_line_dedup(table: str = "documents") -> str:
    h = "('0x' || substr(md5('idd|' || doc_id), 1, 4))::BIGINT"
    return f"""
WITH web AS (
  SELECT doc_id, web_text FROM ({sql_synthesize_web(table)})
),
planted AS (
  SELECT doc_id,
         CASE WHEN {h} % {IDD_PLANT_MOD} = 0
              THEN web_text || chr(10) || string_split(web_text, chr(10))[1]
              ELSE web_text END AS web_text
  FROM web
),
sp AS (
  SELECT doc_id, string_split(web_text, chr(10)) AS lines FROM planted
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(lines)
            - len(list_filter(lines, (x, i) -> list_position(lines, x) = i))
            AS BIGINT) AS n_dropped,
       array_to_string(list_filter(lines, (x, i) -> list_position(lines, x) = i),
                       chr(10)) AS clean_text
FROM sp
"""


# ------------------------------------------------- host quality aggregation
# Crawl-frontier prioritization: a live crawler spends its budget on hosts
# whose PAST documents were worth keeping. One host-keyed census over the
# corpus aggregates document count, token mass and mean readability (the
# shared textops.flesch_milli kernel, clamped at 0 so the integer mean is
# floor-stable across engines), and scores each host quality x log-size —
# the cheap stand-in for the quality-weighted frontier rules crawl
# pipelines actually run (a host with many good docs outranks both a
# one-hit host and a content-farm with thousands of bad ones).
#
# 100 TB shape: ONE groupBy(host) with map-side partial sums over a narrow
# Project (host regex + count algebra); output is host-space-sized. The
# log2 is the engine's exact bin-length trick — no float anywhere.


def host_quality_rank(documents: DataFrame) -> DataFrame:
    """(host, n_docs, n_words, mean_flesch_milli, log2_docs,
    priority_milli) — one row per URL host: mean clamped Flesch score,
    exact floor(log2(n_docs)) + 1 via bin-length, and the crawl priority
    mean * log-size."""
    from .textops import flesch_milli, readability_counts

    web = synthesize_web(documents).select("doc_id", "web_text")
    host = F.regexp_extract("web_text", RE_HOST, 1)
    w, s, y = readability_counts(F.col("web_text"))
    scored = web.select(
        F.when(host == "", F.lit("(none)")).otherwise(host).alias("host"),
        w.cast("long").alias("_w"),
        F.greatest(F.lit(0).cast("long"), flesch_milli(w, s, y)).alias("_f"),
    )
    agg = scored.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_w").alias("n_words"),
        F.sum("_f").alias("_fs"),
    )
    mean = F.expr("_fs div n_docs").cast("long")
    log2 = F.length(F.bin(F.col("n_docs"))).cast("long")
    return agg.select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_words").cast("long").alias("n_words"),
        mean.alias("mean_flesch_milli"),
        log2.alias("log2_docs"),
        (mean * log2).alias("priority_milli"),
    )


def sql_host_quality_rank(table: str = "documents") -> str:
    return f"""
WITH web AS (
  SELECT doc_id, web_text FROM ({sql_synthesize_web(table)})
),
scored AS (
  SELECT COALESCE(NULLIF(regexp_extract(web_text, '{RE_HOST}', 1), ''),
                  '(none)') AS host,
         CAST(GREATEST(1, len(string_split(web_text, ' '))) AS BIGINT) AS w,
         GREATEST(0::BIGINT,
           206835
           - (1015 * GREATEST(1, len(string_split(web_text, ' '))))
             // GREATEST(1, len(web_text)
                            - len(regexp_replace(web_text, '[.!?]', '', 'g')))
           - (84600 * GREATEST(1, len(string_split_regex(lower(web_text),
                                                         '[aeiou]+')) - 1))
             // GREATEST(1, len(string_split(web_text, ' ')))) AS f
  FROM web
),
agg AS (
  SELECT host, COUNT(*)::BIGINT AS n_docs, SUM(w)::BIGINT AS n_words,
         (SUM(f)::BIGINT // COUNT(*)::BIGINT)::BIGINT AS mean_flesch_milli
  FROM scored GROUP BY host
)
SELECT host, n_docs, n_words, mean_flesch_milli,
       CAST(length(bin(n_docs)) AS BIGINT) AS log2_docs,
       (mean_flesch_milli * length(bin(n_docs)))::BIGINT AS priority_milli
FROM agg
"""


# -------------------------------------------- temperature-scaled sampling
# Multilingual temperature sampling (mBERT / XLM-R's alpha rebalancing):
# instead of hand-set weights (MIX_WEIGHTS), the per-language share is
# computed FROM the data as p_l^alpha with alpha = 0.5 — low-resource
# languages are upsampled relative to their raw share, the crawl-head
# language is damped. p^0.5 needs a square root; to stay bit-exact across
# engines it is an EXACT integer sqrt: floor(sqrt(double)) followed by a
# +-1 integer correction, so any FP rounding of the double sqrt is
# repaired by pure int64 comparisons and both engines agree exactly.

TEMP_BUDGET_PCT = 50  # global budget: half the corpus tokens


def _isqrt_expr(n: str) -> str:
    """Exact integer sqrt of non-negative bigint expression `n` as a SQL
    string valid in BOTH Spark SQL and DuckDB (floor-double seed, integer
    correction for FP rounding either way)."""
    s0 = f"cast(floor(sqrt(cast({n} as double))) as bigint)"
    return (
        f"(({s0}) + (case when (({s0}) + 1) * (({s0}) + 1) <= ({n}) then 1 else 0 end)"
        f" - (case when ({s0}) * ({s0}) > ({n}) then 1 else 0 end))"
    )


def temperature_mixture(
    documents: DataFrame, budget_pct: int = TEMP_BUDGET_PCT
) -> DataFrame:
    """(lang, n_docs, n_tokens, share_pm, temp_share_pm, rate_pm, epochs,
    kept_docs, kept_tokens) — per-language temperature-sampling report:
    raw token share, the alpha=0.5 rebalanced share (isqrt(n_tokens)
    normalized over languages), the per-mille keep rate that hits the
    rebalanced token target under the global budget (capped at 1000), the
    number of FULL repeat epochs an upsampled language needs beyond
    hash-sampling (target div actual), and what the md5-coin cut actually
    kept.

    100 TB shape: identical to mixture_sample — ONE language census
    shuffle with map-side combine, two 1-row normalizer aggregates over
    the language-space-sized census, a narrow AQE-broadcast join of the
    rate table onto the corpus, then ONE final language groupBy of the
    kept rows. The corpus is never regrouped; the only transcendental
    (sqrt) is integer-corrected to exactness."""
    doc_id = F.col("doc_id").cast("string")
    toks = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("long")
    census = (
        documents.select(
            F.col("lang").cast("string").alias("lang"), toks.alias("t")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"), F.sum("t").alias("n_tokens"))
    )
    # language-space-sized, three consumers (totals, sqrt-sum, rate table)
    census = census.localCheckpoint(eager=False)
    census = census.withColumn("s", F.expr(_isqrt_expr("n_tokens")))
    norms = census.agg(
        F.sum("n_tokens").alias("_tm_total"), F.sum("s").alias("_tm_ssum")
    )
    rates = census.crossJoin(norms).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr("(1000 * n_tokens) div _tm_total").cast("long").alias("share_pm"),
        F.expr("(1000 * s) div _tm_ssum").cast("long").alias("temp_share_pm"),
        F.expr(
            f"(((_tm_total * {int(budget_pct)}) div 100) * s) div _tm_ssum"
        ).alias("_target"),
    )
    rates = rates.select(
        "lang",
        "n_docs",
        "n_tokens",
        "share_pm",
        "temp_share_pm",
        F.least(F.lit(1000).cast("long"), F.expr("(1000 * _target) div n_tokens"))
        .cast("long")
        .alias("rate_pm"),
        F.expr("_target div n_tokens").cast("long").alias("epochs"),
    )
    coin = (_hx(F.md5(F.concat(F.lit("tmp|"), doc_id)), 1, 5) % 1000).cast("long")
    kept = (
        documents.select(
            F.col("lang").cast("string").alias("lang"),
            toks.alias("t"),
            coin.alias("c"),
        )
        .join(rates.select("lang", "rate_pm"), "lang")
        .filter(F.col("c") < F.col("rate_pm"))
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
            "share_pm",
            "temp_share_pm",
            "rate_pm",
            "epochs",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


def sql_temperature_mixture(
    table: str = "documents", budget_pct: int = TEMP_BUDGET_PCT
) -> str:
    """DuckDB mirror: identical census, exact-isqrt rebalancing, rate
    table, md5 coin, and kept census."""
    isq = _isqrt_expr("n_tokens")
    return f"""
WITH census AS (
  SELECT CAST(lang AS VARCHAR) AS lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT)
           AS n_tokens
  FROM {table} GROUP BY 1
),
sq AS (
  SELECT lang, n_docs, n_tokens, {isq} AS s FROM census
),
norms AS (SELECT SUM(n_tokens) AS total, SUM(s) AS ssum FROM sq),
rates AS (
  SELECT lang, n_docs, n_tokens,
         CAST((1000 * n_tokens) // norms.total AS BIGINT) AS share_pm,
         CAST((1000 * s) // norms.ssum AS BIGINT) AS temp_share_pm,
         CAST(LEAST(1000, (1000 * ((((norms.total * {int(budget_pct)}) // 100) * s)
                                   // norms.ssum)) // n_tokens) AS BIGINT) AS rate_pm,
         CAST(((((norms.total * {int(budget_pct)}) // 100) * s) // norms.ssum)
              // n_tokens AS BIGINT) AS epochs
  FROM sq, norms
),
kept AS (
  SELECT CAST(d.lang AS VARCHAR) AS lang,
         CAST(COUNT(*) AS BIGINT) AS kept_docs,
         CAST(SUM(len(list_filter(string_split(d.text, ' '), w -> w <> ''))) AS BIGINT)
           AS kept_tokens
  FROM {table} d JOIN rates r ON CAST(d.lang AS VARCHAR) = r.lang
  WHERE (('0x' || substr(md5('tmp|' || CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
         % 1000) < r.rate_pm
  GROUP BY 1
)
SELECT r.lang, r.n_docs, r.n_tokens, r.share_pm, r.temp_share_pm, r.rate_pm,
       r.epochs,
       CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
ORDER BY r.lang
"""


# ------------------------------------------------------ snapshot diff census
# Crawl-snapshot churn (CommonCrawl month-over-month): which documents were
# added, removed, changed, or carried unchanged between two dated snapshots.
# The churn relation is what sizes an INCREMENTAL recrawl/reprocess (only
# added+changed re-enter the pipeline) and what detects a broken snapshot
# (removal spikes) before it poisons dedup history.


def synthesize_snapshots(documents: DataFrame):
    """Deterministic two-snapshot pair from the documents table (the
    synthesizer pattern — md5-scheduled, mirrored byte-exact in SQL):
    snapshot A is the corpus; in snapshot B ~1/8 of docs are REMOVED
    (md5 'sdel' bucket), ~1/8 of survivors are CHANGED (text suffixed),
    and ~1/8 reappear as NEW doc_ids ('n' prefix)."""
    base = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )

    def bucket(tag):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(tag + "|"), F.col("doc_id"))), 1, 4),
                16,
                10,
            ).cast("long")
            % 8
            == 0
        )

    snap_a = base
    kept = base.filter(~bucket("sdel"))
    mutated = kept.select(
        "doc_id",
        F.when(bucket("smut"), F.concat("text", F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = base.filter(bucket("snew")).select(
        F.concat(F.lit("n"), F.col("doc_id")).alias("doc_id"), "text"
    )
    snap_b = mutated.unionByName(new)
    return snap_a, snap_b


def snapshot_status(snap_a: DataFrame, snap_b: DataFrame) -> DataFrame:
    """(doc_id, status) per doc_id of the UNION of two (doc_id, text)
    snapshots — the per-doc face of the churn census, and the relation
    jobs/snapshot_job.py reads its reprocess set (added + changed) from.
    Each side reduces to (doc_id, md5) narrowly; ONE full-outer join."""
    fa = snap_a.select("doc_id", F.md5("text").alias("fp_a"))
    fb = snap_b.select("doc_id", F.md5("text").alias("fp_b"))
    j = fa.join(fb, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp_a").isNull(), F.lit("added"))
        .when(F.col("fp_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") == F.col("fp_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", status.alias("status"))


def snapshot_diff(documents: DataFrame) -> DataFrame:
    """(status, n_docs, share_pm) over {added, removed, changed, unchanged}
    between the two synthesized snapshots; share_pm is per-mille of the
    doc_id UNION.

    100 TB shape: each snapshot reduces to (doc_id, md5 fingerprint) in a
    narrow Project — the text never crosses a shuffle; ONE full-outer join
    keyed on doc_id (exchange-free when snapshots are stored
    bucket(doc_id), the write_bucketed_spans layout; with STORED
    fingerprint columns the scan reads 2 thin columns only); then one
    census aggregate to <= 4 rows with map-side partials. Incremental
    reprocess cost = added + changed rows, read straight off this
    relation."""
    snap_a, snap_b = synthesize_snapshots(documents)
    census = snapshot_status(snap_a, snap_b).groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    total = census.agg(F.sum("n_docs").alias("total"))
    return (
        census.crossJoin(total)
        .select(
            "status",
            "n_docs",
            F.expr("(1000 * n_docs) div total").cast("long").alias("share_pm"),
        )
        .orderBy("status")
    )


def _sql_snapshots(table: str = "documents"):
    def bucket(tag: str) -> str:
        return (
            f"(('0x' || substr(md5('{tag}|' || CAST(doc_id AS VARCHAR)), 1, 4))"
            "::BIGINT % 8) = 0"
        )

    snap_a = f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM {table}"
    snap_b = f"""
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN {bucket('smut')} THEN text || ' [rev2]' ELSE text END AS text
  FROM {table} WHERE NOT ({bucket('sdel')})
  UNION ALL
  SELECT 'n' || CAST(doc_id AS VARCHAR), text FROM {table} WHERE {bucket('snew')}
"""
    return snap_a, snap_b


def sql_snapshot_diff(table: str = "documents") -> str:
    """DuckDB mirror of snapshot_diff."""
    snap_a, snap_b = _sql_snapshots(table)
    return f"""
WITH fa AS (SELECT doc_id, md5(text) AS fp_a FROM ({snap_a})),
fb AS (SELECT doc_id, md5(text) AS fp_b FROM ({snap_b})),
j AS (SELECT fa.fp_a, fb.fp_b FROM fa FULL OUTER JOIN fb USING (doc_id)),
census AS (
  SELECT CASE WHEN fp_a IS NULL THEN 'added'
              WHEN fp_b IS NULL THEN 'removed'
              WHEN fp_a = fp_b THEN 'unchanged'
              ELSE 'changed' END AS status,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM j GROUP BY 1
),
tot AS (SELECT SUM(n_docs) AS total FROM census)
SELECT status, n_docs,
       CAST((1000 * n_docs) // tot.total AS BIGINT) AS share_pm
FROM census, tot
ORDER BY status
"""


# ------------------------------------------------ training-order run audit
def order_run_stats(
    documents: DataFrame, epoch: int = 0, n_shards: int = SHUF_SHARDS
) -> DataFrame:
    """(shard, n_docs, n_runs, max_run, mean_run_milli) — mixing quality of
    the epoch_shuffle training order: run lengths of consecutive SAME-LANG
    documents within each shard's read order. A good shuffle shows runs
    near the geometric expectation (mean ~ 1/(1-p) for majority share p);
    long runs mean the loader feeds the model single-language stretches —
    the gradient-staleness failure data-order shuffles exist to prevent.

    Carries lang THROUGH the shard/pos derivation (the same md5 schedule as
    epoch_shuffle — equality pinned by test) so no doc-keyed join back is
    needed: ONE shuffle onto the shard key; the run windows are partitioned
    by shard and ordered by the same key the shard sort produced."""
    h = F.md5(
        F.concat(
            F.lit("shuf|"), F.lit(str(epoch)), F.lit("|"),
            F.col("doc_id").cast("string"),
        )
    )
    base = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "lang",
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards)
        .cast("int")
        .alias("shard"),
        h.alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    start = (
        F.lag("lang").over(w).isNull()
        | (F.col("lang") != F.lag("lang").over(w))
    ).cast("long")
    wrun = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = base.select(
        "shard", F.sum(start).over(wrun).alias("run_id")
    )
    runs = rows.groupBy("shard", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return (
        runs.groupBy("shard")
        .agg(
            F.sum("run_len").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("run_len").alias("max_run"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_runs",
            F.col("max_run").cast("long").alias("max_run"),
            F.expr("(1000 * n_docs) div n_runs")
            .cast("long")
            .alias("mean_run_milli"),
        )
        .orderBy("shard")
    )


def sql_order_run_stats(
    table: str = "documents", epoch: int = 0, n_shards: int = SHUF_SHARDS
) -> str:
    """DuckDB mirror of order_run_stats."""
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
         CAST(('0x' || substr(md5('shuf|{epoch}|' || CAST(doc_id AS VARCHAR)),
               1, 4))::BIGINT % {n_shards} AS INT) AS shard,
         md5('shuf|{epoch}|' || CAST(doc_id AS VARCHAR)) AS h
  FROM {table}
),
flagged AS (
  SELECT shard, lang, h, doc_id,
         CASE WHEN lag(lang) OVER (PARTITION BY shard ORDER BY h, doc_id)
                   IS NULL
              OR lang <> lag(lang) OVER (PARTITION BY shard ORDER BY h, doc_id)
              THEN 1 ELSE 0 END AS start
  FROM base
),
rows_r AS (
  SELECT shard,
         SUM(start) OVER (PARTITION BY shard ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
),
runs AS (
  SELECT shard, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM rows_r GROUP BY shard, run_id
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(SUM(run_len) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST((1000 * SUM(run_len)) // COUNT(*) AS BIGINT) AS mean_run_milli
FROM runs GROUP BY shard
ORDER BY shard
"""


# ------------------------------------------------------- URL features
def url_features(urls: DataFrame) -> DataFrame:
    """(doc_id, url, path_depth, url_len, n_params, has_fragment,
    has_tracking) — the URL-side quality features web filters gate on
    before reading a byte of content (FineWeb/RefinedWeb both URL-filter
    first): deep paths and parameter-heavy URLs correlate with
    auto-generated chaff, tracking params mark syndication. Pure regexp
    Column algebra: ZERO shuffle, a narrow map over the frontier table."""
    u = F.col("url")
    no_scheme = F.regexp_replace(u, r"^https?://", "")
    path = F.regexp_replace(no_scheme, r"[?#].*$", "")
    depth = (
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")) - 1
    ).cast("long")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    ).cast("long")
    return urls.select(
        "doc_id",
        "url",
        F.greatest(depth, F.lit(0).cast("long")).alias("path_depth"),
        F.length(u).cast("long").alias("url_len"),
        n_params.alias("n_params"),
        u.contains("#").alias("has_fragment"),
        u.rlike(r"[?&]utm_").alias("has_tracking"),
    )


def sql_url_features(table: str = "documents") -> str:
    """DuckDB mirror of url_features over the synthesize_urls schedule."""
    did = "CAST(doc_id AS BIGINT)"
    base = (
        f"'site' || CAST({did} // 5 AS VARCHAR) || '.org/a/p' "
        f"|| CAST({did} // 50 AS VARCHAR)"
    )
    return f"""
WITH u AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE CAST(doc_id AS BIGINT) % 5
           WHEN 0 THEN 'https://' || {base}
           WHEN 1 THEN 'http://www.' || {base} || '/'
           WHEN 2 THEN 'https://' || {base} || '?utm_source=feed&utm_campaign=c1'
           WHEN 3 THEN 'https://' || {base} || '#section-2'
           ELSE 'https://' || {base} || '?id=7'
         END AS url
  FROM {table}
)
SELECT doc_id, url,
       CAST(GREATEST(len(list_filter(string_split(
              regexp_replace(regexp_replace(url, '^https?://', ''),
                             '[?#].*$', ''), '/'), s -> s <> '')) - 1, 0)
            AS BIGINT) AS path_depth,
       CAST(length(url) AS BIGINT) AS url_len,
       CAST(CASE WHEN regexp_extract(url, '\\?([^#]*)', 1) = '' THEN 0
            ELSE len(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'))
            END AS BIGINT) AS n_params,
       (url LIKE '%#%') AS has_fragment,
       regexp_matches(url, '[?&]utm_') AS has_tracking
FROM u
"""
