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
