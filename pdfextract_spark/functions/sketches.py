"""Probabilistic sketches with bit-exact cross-engine arithmetic.

At 10^12 documents the distinct-count and heavy-hitter questions a corpus
pipeline asks constantly ("distinct docs per host", "which n-grams exceed
0.01% of the token stream") cannot be answered with exact per-key state —
the sketch IS the scale tool. Everything here keeps the repo's fixed-point
discipline: hashes are md5-derived integers, register updates and
estimator arithmetic are pure int64, and the one genuinely transcendental
piece (the linear-counting ln table) is precomputed in Python once and
embedded as identical integer literals in BOTH the Spark plan and the
DuckDB mirror — no engine evaluates a float, so the mirrors are bit-exact.

HyperLogLog (Flajolet et al. 2007):
  register index = low HLL_P bits of a 60-bit md5 hash, rho = leading-zero
  count of the remaining 54-bit suffix + 1 (computed as 55 - bitlength,
  identical `length(bin(w))` idiom in both engines). Per-group state is
  max(rho) per register — the groupBy(key, register) key space is
  |keys| * 2^HLL_P, map-side combinable, and register relations MERGE
  (max) across partitions, days, or streams, which is the whole point.

100 TB shape: ONE groupBy on (key, register) with partial aggregation,
then a key-sized register fold. No distinct shuffle over the corpus —
that is what the sketch replaces. The exact-count audit column kept next
to the estimate is the sandbox verification surface (it is the one piece
a production run at 10^12 would drop).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .graphops import HOSTS, _host_of

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_HASH_BITS = 60             # 15 md5 hex chars -> fits int64
HLL_W_BITS = HLL_HASH_BITS - HLL_P
HLL_TERM = 1 << 30             # fixed-point unit for sum(2^-rho)
# alpha_64 = 0.7213 / (1 + 1.079/64) ~= 0.709 (Flajolet's constant for m=64)
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 709, 1000
HLL_LC_BOUND = 5 * HLL_M // 2  # small-range correction threshold (2.5m)

# linear-counting table: lc[V] = round(m * ln(m / V)) for V = 1..m zeros.
# Precomputed HERE (plain Python) and embedded as integer literals in both
# engines' plans, so neither engine computes a logarithm.
HLL_LC_TABLE = [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def hll_host_distinct(documents: DataFrame) -> DataFrame:
    """(host, n_regs, zeros, hll_raw, hll_est, exact, err_permille) —
    HyperLogLog distinct-document estimate per host next to the exact
    count and its per-mille error.

    hll_raw = alpha * m^2 / sum(2^-max_rho) in integer fixed-point
    (HLL_TERM units; empty registers contribute a full HLL_TERM);
    hll_est applies Flajolet's linear-counting small-range correction
    (est <= 2.5m and zeros > 0) via the embedded integer ln table."""
    doc = F.col("doc_id").cast("string")
    keyed = documents.select(_host_of(doc).alias("h"), F.col("doc_id"))
    regs = keyed.select(
        F.col("h").alias("host"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("hll|"), doc)), 1, 15), 16, 10)
            .cast("long")
        ).alias("_hx"),
    ).select(
        "host",
        (F.col("_hx") % HLL_M).cast("int").alias("reg"),
        F.when(F.expr(f"_hx div {HLL_M}") == 0, F.lit(HLL_W_BITS + 1))
        .otherwise(
            F.lit(HLL_W_BITS + 1)
            - F.length(F.conv(F.expr(f"cast(_hx div {HLL_M} as string)"), 10, 2))
        )
        .cast("int")
        .alias("rho"),
    )
    reg_state = regs.groupBy("host", "reg").agg(F.max("rho").alias("mr"))
    folded = reg_state.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(F.expr(f"shiftright(cast({HLL_TERM} as long), mr)")).alias("_s_seen"),
    )
    est = folded.select(
        "host",
        "n_regs",
        (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("zeros"),
        F.expr(
            f"cast(({HLL_ALPHA_NUM} * {HLL_M} * {HLL_M}"
            f" * cast({HLL_TERM} as long)) div"
            f" ({HLL_ALPHA_DEN} * (_s_seen + ({HLL_M} - n_regs)"
            f" * cast({HLL_TERM} as long))) as long)"
        ).alias("hll_raw"),
    )
    lc = F.element_at(
        F.array(*[F.lit(v).cast("long") for v in HLL_LC_TABLE]), F.col("zeros").cast("int")
    )
    corrected = est.select(
        "host",
        "n_regs",
        "zeros",
        "hll_raw",
        F.when((F.col("zeros") > 0) & (F.col("hll_raw") <= HLL_LC_BOUND), lc)
        .otherwise(F.col("hll_raw"))
        .cast("long")
        .alias("hll_est"),
    )
    exact = keyed.groupBy(F.col("h").alias("host")).agg(
        F.count_distinct(F.col("doc_id")).alias("exact")
    )
    return (
        corrected.join(exact, "host")
        .select(
            "host",
            "n_regs",
            "zeros",
            "hll_raw",
            "hll_est",
            "exact",
            F.expr("cast((1000 * abs(hll_est - exact)) div exact as long)").alias(
                "err_permille"
            ),
        )
        .orderBy("host")
    )


def sql_hll_host_distinct(table: str = "documents") -> str:
    """DuckDB mirror: identical md5 hash split, register max, integer
    estimator, and the SAME embedded linear-counting table."""
    host = (
        f"'h' || CAST((('0x' || substr(md5('hs|' || CAST(doc_id AS VARCHAR)), 1, 4))"
        f"::BIGINT % {HOSTS}) AS VARCHAR)"
    )
    lc_list = ", ".join(str(v) for v in HLL_LC_TABLE)
    return f"""
WITH hashed AS (
  SELECT {host} AS host,
         doc_id,
         ('0x' || substr(md5('hll|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hx
  FROM {table}
),
regs AS (
  SELECT host,
         CAST(hx % {HLL_M} AS INT) AS reg,
         CAST(CASE WHEN hx // {HLL_M} = 0 THEN {HLL_W_BITS + 1}
              ELSE {HLL_W_BITS + 1} - length(bin(hx // {HLL_M})) END AS INT) AS rho
  FROM hashed
),
state AS (
  SELECT host, reg, MAX(rho) AS mr FROM regs GROUP BY host, reg
),
folded AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_regs,
         SUM({HLL_TERM} >> mr) AS s_seen
  FROM state GROUP BY host
),
est AS (
  SELECT host, n_regs,
         CAST({HLL_M} - n_regs AS BIGINT) AS zeros,
         CAST(({HLL_ALPHA_NUM} * {HLL_M} * {HLL_M} * CAST({HLL_TERM} AS BIGINT))
              // ({HLL_ALPHA_DEN} * (s_seen + ({HLL_M} - n_regs)
                  * CAST({HLL_TERM} AS BIGINT))) AS BIGINT) AS hll_raw
  FROM folded
),
corrected AS (
  SELECT host, n_regs, zeros, hll_raw,
         CAST(CASE WHEN zeros > 0 AND hll_raw <= {HLL_LC_BOUND}
              THEN ([{lc_list}])[CAST(zeros AS INT)]
              ELSE hll_raw END AS BIGINT) AS hll_est
  FROM est
),
exact AS (
  SELECT {host} AS host, COUNT(DISTINCT doc_id) AS exact FROM {table} GROUP BY 1
)
SELECT c.host, c.n_regs, c.zeros, c.hll_raw, c.hll_est,
       CAST(e.exact AS BIGINT) AS exact,
       CAST((1000 * abs(c.hll_est - e.exact)) // e.exact AS BIGINT) AS err_permille
FROM corrected c JOIN exact e ON c.host = e.host
ORDER BY c.host
"""


# ----------------------------------------------------- count-min sketch
# Heavy hitters with an exact-verify second pass. The naive "which tokens
# exceed x% of the stream" census shuffles the full vocabulary (unbounded:
# vocab grows with corpus size). The CMS two-pass bounds every state:
#   pass 1 — a (row, bucket) census of CMS_D x CMS_W cells, map-side
#   combinable, 2048 cells TOTAL regardless of vocabulary;
#   pass 2 — each occurrence looks its CMS_D cells up via joins against
#   the tiny census (AQE broadcasts the 512-row sides; no hint needed),
#   keeps occurrences whose min-cell estimate clears the threshold, and
#   only THOSE are exactly counted: the exact census key space is bounded
#   by total/threshold (a CMS estimate never undercounts, so no true
#   heavy hitter is filtered), and the post-count threshold re-check
#   discards the sketch's false positives — output is EXACTLY the true
#   heavy-hitter set with exact counts.

CMS_D = 4        # hash rows
CMS_W = 512      # buckets per row -> 2048 census cells total
HH_PERMILLE = 2  # heavy hitter = token with > 0.2% of all occurrences


def _cms_bucket(token, i: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{i}|"), token)), 1, 8), 16, 10
        ).cast("long")
        % CMS_W
    )


def heavy_hitters(documents: DataFrame) -> DataFrame:
    """(token, cms_est, n) for every token whose exact occurrence count
    clears HH_PERMILLE per-mille of the corpus token stream, found via a
    count-min candidate pass and verified exactly; cms_est carries the
    sketch's (over-)estimate next to the exact count so the estimate
    error is visible in the relation."""
    toks = documents.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"), _cms_bucket(F.col("token"), i).alias("b")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.b")
    cms = cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c"))
    # 2048-cell reduced frame with CMS_D consumers below: checkpoint per
    # the census rule (reduced multi-consumer frames, never exploded ones)
    cms = cms.localCheckpoint(eager=False)
    total = toks.agg(F.sum(F.lit(1)).cast("long").alias("_t"))

    probed = toks
    for i in range(CMS_D):
        side = cms.filter(F.col("r") == i).select(
            F.col("b").alias(f"_b{i}"), F.col("c").alias(f"_c{i}")
        )
        probed = probed.withColumn(f"_b{i}", _cms_bucket(F.col("token"), i)).join(
            side, f"_b{i}"
        )
    est = F.least(*[F.col(f"_c{i}") for i in range(CMS_D)])
    survivors = (
        probed.crossJoin(total)
        .withColumn("_thr", F.expr(f"greatest(1, ({HH_PERMILLE} * _t) div 1000)"))
        .filter(est >= F.col("_thr"))
        .select("token", est.alias("cms_est"), "_thr")
    )
    return (
        survivors.groupBy("token")
        .agg(
            F.max("cms_est").alias("cms_est"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("_thr").alias("_thr"),
        )
        .filter(F.col("n") >= F.col("_thr"))
        .select("token", "cms_est", "n")
        .orderBy(F.desc("n"), F.asc("token"))
    )


def sql_heavy_hitters(table: str = "documents") -> str:
    """DuckDB mirror: identical md5 cell hashing, census, min-cell
    estimate, threshold, and exact verify."""
    def bucket(i: int, col: str = "token") -> str:
        return f"(('0x' || substr(md5('cms{i}|' || {col}), 1, 8))::BIGINT % {CMS_W})"

    cell_union = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS r, {bucket(i)} AS b FROM toks" for i in range(CMS_D)
    )
    joins = "\n".join(
        f"JOIN cms c{i} ON c{i}.r = {i} AND c{i}.b = {bucket(i, 't.token')}"
        for i in range(CMS_D)
    )
    least = "LEAST(" + ", ".join(f"c{i}.c" for i in range(CMS_D)) + ")"
    return f"""
WITH toks AS (
  SELECT token FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS token FROM {table}
  ) WHERE token <> ''
),
cms AS (
  SELECT r, b, COUNT(*) AS c FROM (
{cell_union}
  ) GROUP BY r, b
),
total AS (SELECT COUNT(*) AS t FROM toks),
survivors AS (
  SELECT t.token,
         {least} AS cms_est,
         GREATEST(1, ({HH_PERMILLE} * total.t) // 1000) AS thr
  FROM toks t
{joins}
  CROSS JOIN total
  WHERE {least} >= GREATEST(1, ({HH_PERMILLE} * total.t) // 1000)
)
SELECT token,
       CAST(MAX(cms_est) AS BIGINT) AS cms_est,
       CAST(COUNT(*) AS BIGINT) AS n
FROM survivors
GROUP BY token
HAVING COUNT(*) >= MAX(thr)
ORDER BY n DESC, token ASC
"""


# ------------------------------------------------------ bloom-filter audit
# The incremental-dedup bloom prefilter (PLANS.md: InjectRuntimeFilter over
# stored fingerprints) trades shuffle volume for false-positive re-checks.
# This relation MEASURES that trade on the corpus itself: build an
# m-bit/k-hash bloom over the history half's fingerprints, probe the batch
# half, and report the realized false-positive rate next to the bit load —
# the number that sizes m (bits per key) for a target re-check budget.

BLOOM_M = 1 << 12  # filter bits — sized so the fixture SFs exercise a real
#                    load (an oversized filter realizes zero FPs and the
#                    audit relation degenerates; production m is the dial
#                    this relation exists to size)
BLOOM_K = 4        # hash functions


def _bloom_pos(fp, j: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{j}|"), fp)), 1, 8), 16, 10
        ).cast("long")
        % BLOOM_M
    )


def bloom_fpr(documents: DataFrame) -> DataFrame:
    """1-row (n_history, n_probes, bits_set, n_bloom_hits, n_true_members,
    n_false_pos, load_pm, fpr_pm): an md5-split half of the corpus is the
    history (its distinct md5(text) fingerprints populate the filter), the
    other half probes it. fpr_pm = false positives per mille of the
    NON-member probes — the realized re-check rate the dedup prefilter
    pays; load_pm = bits set per mille of m (past ~500 the filter is
    saturated and m must grow).

    100 TB shape: the bit set is a distinct census BOUNDED at BLOOM_M rows
    regardless of history size (positions, not keys); the probe side
    explodes k = BLOOM_K constant positions per probe and joins the
    bounded bit relation (AQE broadcasts it — bounded by construction, no
    hint); true membership is one fingerprint-keyed join. Nothing
    unbounded crosses a shuffle except the fingerprint relations
    themselves, which any dedup already shuffles."""
    half = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bh|"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    fp = F.md5("text")
    hist = documents.filter(half).select(fp.alias("fp")).distinct()
    hist = hist.localCheckpoint(eager=False)  # feeds bits + membership join
    bits = (
        hist.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("fp"), j) for j in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    bits = bits.localCheckpoint(eager=False)  # <= BLOOM_M rows, 2 consumers
    # planted TRUE members: an md5-selected ~1/8 of the history half is
    # re-probed under 'p'-prefixed ids, so n_true_members (and the
    # no-false-negative contract) is exercised at every fixture SF
    plant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bp|"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 8
        == 0
    )
    probes = documents.filter(~half).select(
        F.col("doc_id").cast("string").alias("doc_id"), fp.alias("fp")
    ).unionByName(
        documents.filter(half & plant).select(
            F.concat(F.lit("p"), F.col("doc_id").cast("string")).alias(
                "doc_id"
            ),
            fp.alias("fp"),
        )
    )
    ppos = probes.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(*[_bloom_pos(F.col("fp"), j) for j in range(BLOOM_K)])
        ).alias("pos"),
    )
    hits = (
        ppos.join(bits.withColumn("_set", F.lit(1)), "pos", "left")
        .groupBy("doc_id", "fp")
        .agg(
            (F.sum(F.coalesce("_set", F.lit(0))) == BLOOM_K).alias("bloom_hit")
        )
    )
    member = hits.join(
        hist.withColumn("_mem", F.lit(1)), "fp", "left"
    ).select(
        "bloom_hit", F.coalesce("_mem", F.lit(0)).alias("is_member")
    )
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    n_hist = hist.agg(F.count(F.lit(1)).cast("long").alias("n_history"))
    agg = member.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
        F.sum(F.col("is_member").cast("long")).alias("n_true_members"),
        F.sum(
            (F.col("bloom_hit") & (F.col("is_member") == 0)).cast("long")
        ).alias("n_false_pos"),
    )
    return (
        agg.crossJoin(n_hist)
        .crossJoin(n_bits)
        .select(
            "n_history",
            "n_probes",
            "bits_set",
            "n_bloom_hits",
            "n_true_members",
            "n_false_pos",
            F.expr(f"(1000 * bits_set) div {BLOOM_M}")
            .cast("long")
            .alias("load_pm"),
            F.expr(
                "CASE WHEN n_probes - n_true_members = 0 THEN 0"
                " ELSE (1000 * n_false_pos) div (n_probes - n_true_members)"
                " END"
            )
            .cast("long")
            .alias("fpr_pm"),
        )
    )


def sql_bloom_fpr(table: str = "documents") -> str:
    """DuckDB mirror of bloom_fpr."""
    half = (
        "(('0x' || substr(md5('bh|' || CAST(doc_id AS VARCHAR)), 1, 4))"
        "::BIGINT % 2) = 0"
    )
    pos = lambda j, col: (
        f"('0x' || substr(md5('bf{j}|' || {col}), 1, 8))::BIGINT % {BLOOM_M}"
    )
    pos_list = ", ".join(pos(j, "fp") for j in range(BLOOM_K))
    return f"""
WITH hist AS (
  SELECT DISTINCT md5(text) AS fp FROM {table} WHERE {half}
),
bits AS (
  SELECT DISTINCT unnest([{pos_list}]) AS pos FROM hist
),
probes AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, md5(text) AS fp
  FROM {table} WHERE NOT ({half})
  UNION ALL
  SELECT 'p' || CAST(doc_id AS VARCHAR), md5(text)
  FROM {table}
  WHERE ({half})
    AND (('0x' || substr(md5('bp|' || CAST(doc_id AS VARCHAR)), 1, 4))
         ::BIGINT % 8) = 0
),
ppos AS (
  SELECT doc_id, fp, unnest([{pos_list}]) AS pos FROM probes
),
hits AS (
  SELECT doc_id, fp,
         (SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) = {BLOOM_K})
           AS bloom_hit
  FROM ppos p LEFT JOIN bits b USING (pos)
  GROUP BY doc_id, fp
),
member AS (
  SELECT h.bloom_hit,
         CASE WHEN m.fp IS NOT NULL THEN 1 ELSE 0 END AS is_member
  FROM hits h LEFT JOIN hist m USING (fp)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(COUNT(*) FILTER (WHERE bloom_hit) AS BIGINT) AS n_bloom_hits,
         CAST(SUM(is_member) AS BIGINT) AS n_true_members,
         CAST(COUNT(*) FILTER (WHERE bloom_hit AND is_member = 0) AS BIGINT)
           AS n_false_pos
  FROM member
),
nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_history FROM hist),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits)
SELECT n_history, n_probes, bits_set, n_bloom_hits, n_true_members,
       n_false_pos,
       CAST((1000 * bits_set) // {BLOOM_M} AS BIGINT) AS load_pm,
       CAST(CASE WHEN n_probes - n_true_members = 0 THEN 0
            ELSE (1000 * n_false_pos) // (n_probes - n_true_members)
            END AS BIGINT) AS fpr_pm
FROM agg, nh, nb
"""
