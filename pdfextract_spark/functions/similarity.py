"""Similarity search over the `embeddings` table (array<float> vectors).

- cosine_topk: brute-force exact top-k neighbors for a bounded query set.
  At 100 TB scale this is the per-shard verification kernel, not the global
  path: the cross join is bounded by `n_query` (broadcast side) so cost is
  n_query * n_vectors, embarrassingly parallel over vector partitions.
- ann_lsh_pairs: the scale path — random-hyperplane LSH signatures computed
  map-side (8 sign bits), one shuffle on the bucket key, pair join within
  buckets only. Recall tunes with bits/bands.

Cross-engine determinism: float sums are order-dependent, so vectors are
quantized to fixed-point integers (q = floor(x*10^4 + 0.5), exact in both
engines). Dot products and squared norms are then EXACT int64 sums; the only
float ops left (sqrt, one divide, round) are IEEE-deterministic scalars.
Hyperplane signs use the same trick: sign(dot(x, r)) with
r(p,d) = lcg(p*DIM+d)/2^31 - 0.5 equals sign(sum(q_d * (lcg - 2^30))) —
pure integer arithmetic, identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DIM = 64
N_PLANES = 8
TOPK = 3
N_QUERY = 50          # query set = vec_id < 50 for the bounded top-k surface
ANN_COS_MIN = 0.15
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648  # 2^31
Q = 10_000             # fixed-point quantization scale


def _quant(a):
    """array<float> -> array<long> fixed-point (exact in both engines)."""
    return F.transform(a, lambda x: F.floor(x.cast("double") * Q + 0.5).cast("long"))


def sql_quant(a: str) -> str:
    return f"list_transform({a}, x -> CAST(floor(x::DOUBLE * {Q} + 0.5) AS BIGINT))"


def _idot(a, b):
    """Exact integer dot product of two quantized arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sql_idot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_concat([0::BIGINT], "
        f"list_transform(range(1, {DIM + 1}), i -> {a}[i] * {b}[i])), "
        f"(x, y) -> x + y)"
    )


def _cos(dot_col, na2_col, nb2_col):
    """Deterministic double cosine from exact integer dot and squared norms."""
    return F.round(
        dot_col.cast("double")
        / (F.sqrt(na2_col.cast("double")) * F.sqrt(nb2_col.cast("double"))),
        4,
    )


def sql_cos(dot: str, na2: str, nb2: str) -> str:
    return f"ROUND({dot}::DOUBLE / (sqrt({na2}::DOUBLE) * sqrt({nb2}::DOUBLE)), 4)"


def _with_quant(embeddings: DataFrame) -> DataFrame:
    qcol = _quant(F.col("embedding"))
    return embeddings.select(
        "vec_id",
        qcol.alias("q"),
    ).withColumn("n2", _idot(F.col("q"), F.col("q")))


def cosine_topk(embeddings: DataFrame) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rank) — exact top-K for vec_id<N_QUERY."""
    base = _with_quant(embeddings)
    q = base.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv"), F.col("n2").alias("qn2")
    )
    c = base.select(
        F.col("vec_id").alias("nid"), F.col("q").alias("nv"), F.col("n2").alias("nn2")
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("qid") != F.col("nid"))
    cos = _cos(_idot("qv", "nv"), F.col("qn2"), F.col("nn2"))
    scored = pairs.select("qid", "nid", cos.alias("cos_sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("nid").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )


def sql_cosine_topk(table: str = "embeddings") -> str:
    cos = sql_cos(sql_idot("q.q", "c.q"), "q.n2", "c.n2")
    return f"""
WITH base AS (
  SELECT vec_id, {sql_quant('embedding')} AS q,
         {sql_idot(sql_quant('embedding'), sql_quant('embedding'))} AS n2
  FROM {table}
),
scored AS (
  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM base q JOIN base c ON q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT vec_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOPK}
"""


def lsh_bucket(embeddings: DataFrame) -> DataFrame:
    """(vec_id, q, n2, bucket) — 8 hyperplane sign bits via exact integer
    dot against centered LCG components, map-side only."""
    base = _with_quant(embeddings)

    def bit(p):
        def comp(d):
            seed = (F.lit(p * DIM).cast("long") + d.cast("long")) * F.lit(
                LCG_A
            ).cast("long") + F.lit(LCG_C)
            return F.pmod(seed, F.lit(LCG_M)) - F.lit(LCG_M // 2)

        dot = F.aggregate(
            F.zip_with(
                F.col("q"),
                F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), comp),
                lambda x, r: x * r,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))

    bucket = bit(0)
    for p in range(1, N_PLANES):
        bucket = bucket + bit(p)
    return base.withColumn("bucket", bucket)


def sql_bucket_expr(q: str = "q") -> str:
    terms = []
    for p in range(N_PLANES):
        dot = (
            f"list_reduce(list_concat([0::BIGINT], "
            f"list_transform(range(0, {DIM}), "
            f"d -> {q}[d+1] * ((({p * DIM} + d) * {LCG_A} + {LCG_C}) % {LCG_M}"
            f" - {LCG_M // 2}))), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def ann_lsh_pairs(embeddings: DataFrame) -> DataFrame:
    """(vec_id_a, vec_id_b, cos_sim) — same-bucket pairs above ANN_COS_MIN."""
    b = lsh_bucket(embeddings)
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vec_id") < F.col("r.vec_id")),
    ).select(
        F.col("l.vec_id").alias("vec_id_a"),
        F.col("r.vec_id").alias("vec_id_b"),
        F.col("l.q").alias("qa"),
        F.col("r.q").alias("qb"),
        F.col("l.n2").alias("na2"),
        F.col("r.n2").alias("nb2"),
    )
    cos = _cos(_idot("qa", "qb"), F.col("na2"), F.col("nb2"))
    return pairs.select("vec_id_a", "vec_id_b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= ANN_COS_MIN
    )


def sql_ann_lsh_pairs(table: str = "embeddings") -> str:
    cos = sql_cos(sql_idot("l.q", "r.q"), "l.n2", "r.n2")
    return f"""
WITH base AS (
  SELECT vec_id, {sql_quant('embedding')} AS q,
         {sql_idot(sql_quant('embedding'), sql_quant('embedding'))} AS n2
  FROM {table}
),
b AS (
  SELECT vec_id, q, n2, {sql_bucket_expr('q')} AS bucket FROM base
)
SELECT l.vec_id AS vec_id_a, r.vec_id AS vec_id_b, {cos} AS cos_sim
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE {cos} >= {ANN_COS_MIN}
"""


def ivf_topk(embeddings: DataFrame) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rank) — IVF-style ANN, the scale path
    for similarity search: a coarse quantizer (per-label integer centroids,
    exact half-away rounding — no float ties) assigns every vector to its
    nearest cell (exact integer squared distance, ties -> smallest label);
    queries probe ONLY their own cell (nprobe=1) and rank candidates by the
    exact fixed-point cosine. At 10^12 scale the cell assignment is one
    broadcast join + map-side argmin, and the candidate join touches
    1/n_cells of the corpus per query instead of all of it."""
    base = _with_quant(embeddings)

    # integer centroids, one array per label (ordered by component)
    sums = (
        embeddings.select(
            "label", F.posexplode(_quant(F.col("embedding"))).alias("pos", "qv")
        )
        .groupBy("label", "pos")
        .agg(F.sum("qv").alias("n"), F.count(F.lit(1)).alias("d"))
    )
    v4 = F.expr("(2 * abs(n) + d) div (2 * d)")
    signed = F.when(F.col("n") < 0, -v4).otherwise(v4)
    cents = (
        sums.select("label", "pos", signed.alias("cq"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cq"))), lambda s: s["cq"]
            ).alias("cvec")
        )
    )

    # cell assignment: exact integer squared distance to every centroid
    d2 = F.aggregate(
        F.zip_with("q", "cvec", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("label"))
    assigned = (
        base.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", "n2", F.col("label").alias("cell"))
    )

    qs = assigned.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv"),
        F.col("n2").alias("qn2"), "cell",
    )
    cand = assigned.select(
        F.col("vec_id").alias("nid"), F.col("q").alias("nv"),
        F.col("n2").alias("nn2"), "cell",
    )
    pairs = qs.join(cand, "cell").filter(F.col("qid") != F.col("nid"))
    cos = _cos(_idot("qv", "nv"), F.col("qn2"), F.col("nn2"))
    scored = pairs.select("qid", "nid", cos.alias("cos_sim"))
    wr = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("nid").alias("neighbor_id"),
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sql_ivf_topk(table: str = "embeddings") -> str:
    cos = sql_cos(sql_idot("qs.q", "cand.q"), "qs.n2", "cand.n2")
    d2 = (
        f"list_reduce(list_concat([0::BIGINT], "
        f"list_transform(range(1, {DIM + 1}), "
        f"i -> (b.q[i] - c.cvec[i]) * (b.q[i] - c.cvec[i]))), (x, y) -> x + y)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, label, {sql_quant('embedding')} AS q,
         {sql_idot(sql_quant('embedding'), sql_quant('embedding'))} AS n2
  FROM {table}
),
sums AS (
  SELECT label, CAST(generate_subscripts(q, 1) AS INT) AS pos, unnest(q) AS qv
  FROM base
),
cint AS (
  SELECT label, pos,
         (CASE WHEN n < 0 THEN -((2 * abs(n) + d) // (2 * d))
               ELSE ((2 * abs(n) + d) // (2 * d)) END) AS cq
  FROM (SELECT label, pos, SUM(qv) AS n, COUNT(*) AS d FROM sums GROUP BY 1, 2)
),
cents AS (
  SELECT label, list(cq ORDER BY pos) AS cvec FROM cint GROUP BY label
),
assigned AS (
  SELECT vec_id, q, n2, cell FROM (
    SELECT b.vec_id, b.q, b.n2, c.label AS cell,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY {d2} ASC, c.label ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
),
scored AS (
  SELECT qs.vec_id AS vec_id, cand.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM assigned qs JOIN assigned cand
    ON qs.cell = cand.cell AND qs.vec_id < {N_QUERY} AND qs.vec_id <> cand.vec_id
)
SELECT vec_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """(label, dim, centroid) — per-cluster mean over quantized components
    (exact integer sum, then one deterministic double divide)."""
    agg = (
        embeddings.select(
            "label",
            F.posexplode(_quant(F.col("embedding"))).alias("pos", "qv"),
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.sum("qv").alias("n"), F.count(F.lit(1)).alias("d"))
    )
    # exact half-away-from-zero rounding at Q scale: no float ties possible
    v4 = F.expr("(2 * abs(n) + d) div (2 * d)")
    signed = F.when(F.col("n") < 0, -v4).otherwise(v4)
    return agg.select(
        "label", "dim", (signed.cast("double") / F.lit(float(Q))).alias("centroid")
    )


def sql_label_centroids_agg(table: str = "embeddings") -> str:
    return f"""
SELECT label, dim,
       (CASE WHEN n < 0 THEN -((2 * abs(n) + d) // (2 * d))
             ELSE ((2 * abs(n) + d) // (2 * d)) END)::DOUBLE / {float(Q)}
       AS centroid
FROM (
  SELECT label, dim, SUM(qv) AS n, COUNT(*) AS d FROM (
    SELECT label, CAST(generate_subscripts(q, 1) AS INT) AS dim, unnest(q) AS qv
    FROM (SELECT label, {sql_quant('embedding')} AS q FROM {table})
  ) GROUP BY label, dim
)
"""
