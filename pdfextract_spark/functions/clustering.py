"""Embedding-space k-means over the `embeddings` table (Lloyd's algorithm,
fixed round count) — the clustering stage of cluster-then-dedup pipelines
(SemDeDup, Abbas et al. 2023: k-means first, near-dup search within
clusters) and the training pass behind the IVF coarse quantizer
(`functions/similarity.ivf_topk` assigns to per-label centroids; this
module LEARNS centroids when no labels exist).

Determinism contract (the driver hash-compares against DuckDB, so "almost
the same floats" is a FAIL):
- embeddings are quantized once to non-negative int64 fixed-point
  (floor((x + 1.0) * 10^6); inputs are unit-normalized so |x| < 1), and
  every subsequent op — distances, centroid means — is exact int64
  arithmetic. Truncating integer division == floor division on the
  non-negative domain, so Spark's `div` and DuckDB's `//` agree.
- seeding is md5-ordered (first K vec_ids by md5('km|'||vec_id)): no RNG,
  no data-order sensitivity, reproducible across runs/retries/engines.
- argmin ties break toward the smaller cluster id in both engines
  (lexicographic (dist, k) min).

100 TB shape: each Lloyd round is ONE groupBy(cluster) aggregation with
map-side partial sums (64 per-dim int64 sums — elementwise, no explode of
the vector column, no per-dim shuffle rows) whose output is K rows; the
assignment pass is a narrow Project against K collected centroid literals
(bounded driver traffic: K rows per round, K=8 — the .collect() allowlist
argument in tests/test_scale_lint.py). Int64 headroom: per-dim cluster sums
reach 2*10^6 per vector, so 10^12 vectors per cluster stays under 2^63.

Reference analog: the reference has no clustering stage (its scope ends at
per-document layout); this is part of the training-data operator family the
brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K_CLUSTERS = 8
KMEANS_ITERS = 2
FIXED_SCALE = 1_000_000
DIM = 64  # embeddings table vector width (TESTDATA.md)


def _quantized(embeddings: DataFrame) -> DataFrame:
    q = F.transform(
        "embedding",
        lambda e: F.floor((e.cast("double") + F.lit(1.0)) * FIXED_SCALE).cast(
            "long"
        ),
    )
    h = F.md5(F.concat(F.lit("km|"), F.col("vec_id").cast("string")))
    return embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"), q.alias("q"), h.alias("h")
    )


def _assign_cols(cents: dict) -> "F.Column":
    """array_min over (dist, k) structs — lexicographic min, ties to the
    smaller k, matching the SQL mirror's ROW_NUMBER ORDER BY dist, k.

    The K centroids ride as ONE nested-array literal (array<array<long>>),
    and the per-centroid distance is a single generic transform/zip_with/
    aggregate expression — tree size O(1) in K, centroid values are literal
    DATA. The earlier per-centroid unrolling (K separate fold expressions)
    made Catalyst compile time grow with K x dim and dominated sandbox round
    wall (measured 2-3s/round at K=8, dim=64); this form compiles once and
    still assigns map-side with zero shuffle. At SemDeDup-production K
    (10^5+) the plan-embedded literal gets heavy — the documented dial is a
    broadcast centroid table + partial-min groupBy(vec_id), same results."""
    arr = F.lit([[int(v) for v in cents[k]] for k in sorted(cents)])
    pairs = F.transform(
        arr,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("q"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
            i.cast("int").alias("k"),
        ),
    )
    return F.array_min(pairs)


def kmeans_assign(
    embeddings: DataFrame,
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
    dim: int = DIM,
) -> DataFrame:
    """(vec_id, cluster, dist) — final Lloyd assignment after `iters`
    centroid updates from the md5-seeded start. `dist` is the exact int64
    squared L2 in fixed-point units (a similarity diagnostic and the
    SemDeDup within-cluster ranking key)."""
    q = _quantized(embeddings)
    # bounded driver traffic: K rows (the seed set), then K rows per round
    seed_rows = q.orderBy("h", "vec_id").limit(k).collect()
    cents = {i: list(r["q"]) for i, r in enumerate(seed_rows)}
    for _ in range(iters):
        best = _assign_cols(cents)
        assigned = q.select("q", best["k"].alias("cluster"))
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new = sums.select(
            "cluster", *[F.expr(f"s{i} div cnt").alias(f"m{i}") for i in range(dim)]
        ).collect()
        # empty clusters keep their previous centroid (standard Lloyd)
        for r in new:
            cents[r["cluster"]] = [r[f"m{i}"] for i in range(dim)]
    best = _assign_cols(cents)
    return q.select(
        "vec_id",
        best["k"].alias("cluster"),
        best["dist"].alias("dist"),
    )


def sql_kmeans_assign(
    table: str = "embeddings",
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
    dim: int = DIM,
) -> str:
    """DuckDB mirror: the same md5 seeding, quantization, and `iters`
    unrolled Lloyd rounds as chained CTEs — assignment via a K-row cross
    join + (dist, k) ROW_NUMBER, centroid update via the same 64 integer
    sums and floor division."""
    qexpr = (
        "list_transform(embedding, "
        f"e -> CAST(floor((CAST(e AS DOUBLE) + 1.0) * {FIXED_SCALE}) AS BIGINT))"
    )
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (q[i] - c[i]) * (q[i] - c[i])))"
    )
    mean_list = ", ".join(f"SUM(q[{i + 1}]) // COUNT(*)" for i in range(dim))
    parts = [
        f"""q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {qexpr} AS q,
         md5('km|' || CAST(vec_id AS VARCHAR)) AS h
  FROM {table}
),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS INT) AS k, q AS c
  FROM (SELECT vec_id, q, h FROM q ORDER BY h, vec_id LIMIT {k})
)"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""a{it} AS (
  SELECT vec_id, q, k AS cluster, {dist} AS dist
  FROM q CROSS JOIN c{it - 1}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {dist}, k) = 1
),
u{it} AS (
  SELECT cluster AS k, [{mean_list}] AS c FROM a{it} GROUP BY cluster
),
c{it} AS (
  SELECT s.k, COALESCE(u.c, s.c) AS c
  FROM c{it - 1} s LEFT JOIN u{it} u USING (k)
)"""
        )
    return f"""
WITH {', '.join(parts)}
SELECT vec_id, CAST(k AS INT) AS cluster, CAST({dist} AS BIGINT) AS dist
FROM q CROSS JOIN c{iters}
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {dist}, k) = 1
"""


# ---------------------------------------------------------------------------
# cluster-balanced sampling (the diversity-preserving cut: sample a quota
# per k-means cluster instead of uniformly, so rare regions of the
# embedding space survive the downsample — the cluster-balanced selection
# step of SemDeDup-family curation pipelines and of "prototype" subset
# papers like Sorscher et al. 2022's self-supervised pruning).
# ---------------------------------------------------------------------------

CLUSTER_CAP = 64  # sandbox quota; the production dial (vectors kept / cluster)


def cluster_sample(embeddings: DataFrame, cap: int = CLUSTER_CAP) -> DataFrame:
    """(vec_id, cluster, rank_in_cluster) — at most `cap` vectors per
    k-means cluster, md5('clsamp|' || vec_id) priority: deterministic,
    nested (cap=K's survivors are a strict prefix of cap=K+1's), and
    uniform WITHIN each cluster, so the output is a balanced cover of the
    embedding space rather than a frequency-weighted one.

    Scale shape: kmeans_assign's cost (assignment is a map-side Project
    against K centroid literals) + ONE shuffle on the cluster key. The
    rank<=cap filter over row_number() plans through Spark 3.5+'s
    WindowGroupLimit — a map-side partial top-`cap` per cluster runs BEFORE
    the exchange, so a mega-cluster ships only cap rows per map task (the
    domain_cap precedent; asserted on the physical plan in
    tests/test_cluster_sample.py)."""
    from pyspark.sql import Window

    assign = kmeans_assign(embeddings).select("vec_id", "cluster")
    pr = F.md5(F.concat(F.lit("clsamp|"), F.col("vec_id").cast("string")))
    ranked = assign.withColumn("pr", pr).withColumn(
        "rank_in_cluster",
        F.row_number()
        .over(Window.partitionBy("cluster").orderBy("pr", "vec_id"))
        .cast("int"),
    )
    return ranked.filter(F.col("rank_in_cluster") <= cap).select(
        "vec_id", "cluster", "rank_in_cluster"
    )


def sql_cluster_sample(table: str = "embeddings", cap: int = CLUSTER_CAP) -> str:
    return f"""
WITH assign AS (
  SELECT vec_id, cluster FROM ({sql_kmeans_assign(table)})
),
d AS (
  SELECT vec_id, cluster, md5('clsamp|' || CAST(vec_id AS VARCHAR)) AS pr
  FROM assign
)
SELECT vec_id, cluster,
       CAST(ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY pr, vec_id) AS INT)
         AS rank_in_cluster
FROM d QUALIFY rank_in_cluster <= {cap}
"""


def cluster_stats(embeddings: DataFrame) -> DataFrame:
    """(cluster, n_vecs, inertia, mean_dist) — per-cluster size and exact
    int64 within-cluster sum of squared distances (the k-means inertia /
    elbow diagnostic: run across k values, the knee picks the SemDeDup /
    IVF cluster count; per-cluster mean_dist exposes loose clusters that
    need a larger k or a re-seed). One groupBy over the assignment — the
    assignment itself is the map-side Project against K centroid literals,
    so the whole diagnostic costs one K-row shuffle."""
    assign = kmeans_assign(embeddings)
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("dist").alias("inertia"),
        F.expr("sum(dist) div count(1)").cast("long").alias("mean_dist"),
    )


def sql_cluster_stats(table: str = "embeddings") -> str:
    return f"""
SELECT cluster, COUNT(*)::BIGINT AS n_vecs, SUM(dist)::BIGINT AS inertia,
       (SUM(dist)::BIGINT // COUNT(*)::BIGINT)::BIGINT AS mean_dist
FROM ({sql_kmeans_assign(table)})
GROUP BY cluster
"""


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011, the IVF-PQ storage path): split
# the vector into M orthogonal subspaces, learn a small codebook per
# subspace with the SAME fixed-point Lloyd kernel, and store each vector as
# M sub-codes. At 10^12 vectors a 64-dim float32 corpus is ~256 TB of raw
# embeddings; M=8 x 8-bit PQ codes store the same corpus in ~8 TB with
# asymmetric-distance search quality — compression IS the embedding-scale
# strategy, not a nicety.
#
# Sandbox dials (production values documented): M=4 subspaces x 16 dims,
# K=8 codewords, 1 Lloyd round. Production: M=8/16, K=256, ~10 rounds —
# same plan shape, only literal sizes change (past K~10^3 the codebook
# rides as a broadcast table instead of a plan literal, the kmeans_assign
# dial).
#
# Scale shape per Lloyd round: ONE shuffle for ALL subspaces — the
# per-subspace argmin assignments are map-side Projects against codebook
# literals, the update explodes each vector into M (subspace, code, subvec)
# rows and runs a single groupBy(m, code) with map-side partial sums whose
# output is M*K rows (32). Driver traffic: K seed rows + M*K rows/round.
# ---------------------------------------------------------------------------

PQ_M = 4        # subspaces (production: 8-16)
PQ_SUBDIM = DIM // PQ_M
PQ_CODES = 8    # codewords per subspace (production: 256)
PQ_ITERS = 1    # Lloyd rounds (production: ~10)


def _pq_best(codebook_m: dict, sub: "F.Column") -> "F.Column":
    """struct(dist, k) argmin of one subspace's codebook over a sub-vector
    column — the _assign_cols pattern on a slice: codewords ride as one
    nested-array literal, ties break to the smaller code in both engines."""
    arr = F.lit([[int(v) for v in codebook_m[k]] for k in sorted(codebook_m)])
    pairs = F.transform(
        arr,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
            i.cast("int").alias("k"),
        ),
    )
    return F.array_min(pairs)


def _pq_train(qp: DataFrame, m: int, codes: int, iters: int, subdim: int) -> dict:
    """Train the per-subspace codebooks over a (vec_id, q, hp) frame and
    return {m: {k: codeword}} — shared by pq_encode (storage path) and
    pq_adc_topk (search path) so encode and search cannot drift.

    Bounded driver traffic: K seed rows shared by every subspace, then
    M*K rows per round (the clustering.py .collect() allowlist argument)."""
    seed_rows = qp.orderBy("hp", "vec_id").limit(codes).collect()
    cb = {
        mm: {
            k: list(r["q"])[mm * subdim : (mm + 1) * subdim]
            for k, r in enumerate(seed_rows)
        }
        for mm in range(m)
    }
    for _ in range(iters):
        entries = F.array(
            *[
                F.struct(
                    F.lit(mm).cast("int").alias("m"),
                    _pq_best(cb[mm], F.slice("q", mm * subdim + 1, subdim))[
                        "k"
                    ].alias("code"),
                    F.slice("q", mm * subdim + 1, subdim).alias("sub"),
                )
                for mm in range(m)
            ]
        )
        rows = qp.select(F.explode(entries).alias("e")).select(
            "e.m", "e.code", "e.sub"
        )
        sums = rows.groupBy("m", "code").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.element_at("sub", i + 1)).alias(f"s{i}")
                for i in range(subdim)
            ],
        )
        new = sums.select(
            "m",
            "code",
            *[F.expr(f"s{i} div cnt").alias(f"m{i}") for i in range(subdim)],
        ).collect()
        # empty codes keep their previous codeword (standard Lloyd)
        for r in new:
            cb[r["m"]][r["code"]] = [r[f"m{i}"] for i in range(subdim)]
    return cb


def pq_encode(
    embeddings: DataFrame,
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    dim: int = DIM,
) -> DataFrame:
    """(vec_id, pq_code, recon_err) — the PQ encoding of every vector after
    `iters` codebook-training rounds from the md5('pq|')-seeded start.
    pq_code is the M sub-codes joined 'c0-c1-...-cM' (the stored
    representation); recon_err is the exact int64 squared quantization
    error summed over subspaces (the PQ distortion diagnostic — rank
    corpora / pick M,K by its distribution)."""
    subdim = dim // m
    base = _quantized(embeddings)
    qp = base.select(
        "vec_id",
        "q",
        F.md5(F.concat(F.lit("pq|"), F.col("vec_id").cast("string"))).alias("hp"),
    )
    cb = _pq_train(qp, m, codes, iters, subdim)
    bests = [
        _pq_best(cb[mm], F.slice("q", mm * subdim + 1, subdim)) for mm in range(m)
    ]
    err = bests[0]["dist"]
    for b in bests[1:]:
        err = err + b["dist"]
    return qp.select(
        "vec_id",
        F.concat_ws("-", *[b["k"].cast("string") for b in bests]).alias("pq_code"),
        err.cast("long").alias("recon_err"),
    )


def sql_pq_encode(
    table: str = "embeddings",
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    dim: int = DIM,
) -> str:
    """DuckDB mirror: same quantization/seeding, `iters` unrolled training
    rounds as chained CTEs over an exploded (vec_id, m) relation — per-
    subspace assignment via a K-row cross join + (dist, k) ROW_NUMBER,
    codebook update via SUBDIM integer sums and floor division, final
    encode re-pivoted per vec_id with an ordered string_agg."""
    subdim = dim // m
    parts, dist = _sql_pq_parts(table, m, codes, iters, subdim)
    return f"""
WITH {', '.join(parts)},
fin AS (
  SELECT sv.vec_id, sv.m, cb.k AS code, {dist} AS dist
  FROM sv JOIN cb{iters} cb ON sv.m = cb.m
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.m
                             ORDER BY {dist}, cb.k) = 1
)
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS pq_code,
       SUM(dist)::BIGINT AS recon_err
FROM fin GROUP BY vec_id
"""


def _sql_pq_parts(
    table: str, m: int, codes: int, iters: int, subdim: int,
    with_label: bool = False,
) -> tuple[list, str]:
    """The shared codebook-training CTE chain (q, ms, sv, seed, cb0..cbI)
    plus the per-(sub, c) squared-distance expression — composed by
    sql_pq_encode (storage) and sql_pq_adc_topk (search). with_label keeps
    the coarse-cell column in the q CTE for the IVF stage."""
    qexpr = (
        "list_transform(embedding, "
        f"e -> CAST(floor((CAST(e AS DOUBLE) + 1.0) * {FIXED_SCALE}) AS BIGINT))"
    )
    dist = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (sub[i] - c[i]) * (sub[i] - c[i])))"
    )
    mean_list = ", ".join(f"SUM(sub[{i + 1}]) // COUNT(*)" for i in range(subdim))
    label_col = "CAST(label AS INT) AS label, " if with_label else ""
    parts = [
        f"""q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {label_col}{qexpr} AS q,
         md5('pq|' || CAST(vec_id AS VARCHAR)) AS hp
  FROM {table}
),
ms AS (SELECT CAST(unnest(range({m})) AS INT) AS m),
sv AS (
  SELECT vec_id, m, list_slice(q, m * {subdim} + 1, (m + 1) * {subdim}) AS sub
  FROM q CROSS JOIN ms
),
seed AS (
  SELECT q, CAST(ROW_NUMBER() OVER (ORDER BY hp, vec_id) - 1 AS INT) AS k
  FROM (SELECT vec_id, q, hp FROM q ORDER BY hp, vec_id LIMIT {codes})
),
cb0 AS (
  SELECT ms.m, seed.k,
         list_slice(seed.q, ms.m * {subdim} + 1, (ms.m + 1) * {subdim}) AS c
  FROM seed CROSS JOIN ms
)"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""a{it} AS (
  SELECT sv.vec_id, sv.m, sv.sub, cb.k AS code, {dist} AS dist
  FROM sv JOIN cb{it - 1} cb ON sv.m = cb.m
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.m
                             ORDER BY {dist}, cb.k) = 1
),
u{it} AS (
  SELECT m, code AS k, [{mean_list}] AS c FROM a{it} GROUP BY m, code
),
cb{it} AS (
  SELECT s.m, s.k, COALESCE(u.c, s.c) AS c
  FROM cb{it - 1} s LEFT JOIN u{it} u ON s.m = u.m AND s.k = u.k
)"""
        )
    return parts, dist


# ---------------------------------------------------------------------------
# IVFADC search (Jegou et al. 2011 §III): the database side stores ONLY a
# coarse cell id + M PQ sub-codes per vector (the pq_encode storage path),
# queries stay full-precision and rank candidates by ASYMMETRIC distance —
# ||q - recon(x)||^2 = sum_m LUT_q[m][code_m(x)] where LUT_q is the query's
# M x K table of exact int64 squared distances to every codeword. At 10^12
# vectors this is the search layout PQ compression exists for: candidate
# scoring touches M small ints per database vector, never the raw 64-dim
# float array (a ~30x read reduction at the sandbox dials, ~250x at
# production M=8/K=256 with 8-bit codes).
#
# Scale shape: codebook training = pq_encode's bounded-driver-traffic Lloyd
# loop (shared _pq_train); coarse cells = per-label integer centroids (the
# ivf_topk quantizer — ONE groupBy whose output is |labels| rows, assignment
# a map-side argmin against the bounded centroid relation, AQE broadcasts
# it); candidate generation joins queries to database rows ON THE CELL KEY
# (nprobe/|cells| of the corpus per query, the recall dial); the per-query
# LUT is computed map-side once per probe row (M*K literal expressions) and
# the ADC sum is M element_at lookups per candidate. Top-k is a per-query
# window over the bounded candidate set.
#
# Determinism: everything through the ADC sum is exact int64 (the module
# contract); argmin/rank ties break (dist, label) / (dist, neighbor_id)
# ascending in both engines.
# ---------------------------------------------------------------------------

PQ_NPROBE = 2     # coarse cells probed per query (recall dial; 1 = classic)
PQ_N_QUERY = 50   # query set = vec_id < 50 (the bounded top-k surface)
PQ_TOPK = 3


def pq_adc_topk(
    embeddings: DataFrame,
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    dim: int = DIM,
    nprobe: int = PQ_NPROBE,
    n_query: int = PQ_N_QUERY,
    topk: int = PQ_TOPK,
) -> DataFrame:
    """(vec_id, neighbor_id, adc_dist, rank) — IVFADC top-k: for each query
    (vec_id < n_query), the `topk` nearest database vectors among its
    `nprobe` probed coarse cells, ranked by exact int64 asymmetric PQ
    distance (ascending, ties to the smaller neighbor_id). The database
    side of the join carries ONLY (vec_id, cell, M sub-codes).

    Invariant (tests/test_pq.py): ADC(q, x) >= recon_err(q) for every x,
    with equality iff x's codes equal q's own — so a planted exact copy of
    a query is guaranteed rank 1 with adc_dist == pq_encode's recon_err."""
    from pyspark.sql import Window

    subdim = dim // m
    base = (
        _quantized(embeddings)
        .drop("h")
        .withColumn(
            "hp",
            F.md5(F.concat(F.lit("pq|"), F.col("vec_id").cast("string"))),
        )
        .join(
            embeddings.select(
                F.col("vec_id").cast("long").alias("vec_id"),
                F.col("label").cast("int").alias("label"),
            ),
            "vec_id",
        )
    )
    # three consumers (codebook training, centroid sums, cell ranking):
    # materialize the quantization once
    base = base.localCheckpoint(eager=False)
    cb = _pq_train(base, m, codes, iters, subdim)

    # coarse centroids: per-label exact signed half-away integer mean
    # (the ivf_topk quantizer) — output is |labels| rows
    sums = (
        base.select("label", F.posexplode("q").alias("pos", "qv"))
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
                F.array_sort(F.collect_list(F.struct("pos", "cq"))),
                lambda s: s["cq"],
            ).alias("cvec"),
        )
        .select(F.col("label").alias("cell"), "cvec")
    )
    d2 = F.aggregate(
        F.zip_with("q", "cvec", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, vv: acc + vv,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cell"))
    # no broadcast hint: cents is |labels| rows, AQE broadcasts at runtime
    ranked = (
        base.drop("label")
        .crossJoin(cents)
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .select("vec_id", "q", "cell", "rn")
        # two consumers (db side rn=1, query side rn<=nprobe): compute once
        .localCheckpoint(eager=False)
    )

    # database side: cell + M sub-codes ONLY (the compressed layout)
    db = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("nid"),
        "cell",
        *[
            _pq_best(cb[mm], F.slice("q", mm * subdim + 1, subdim))["k"].alias(
                f"c{mm}"
            )
            for mm in range(m)
        ],
    )

    # query side: per-probe-row LUT — K exact distances per subspace,
    # codewords ride as literals (M*K bounded expressions)
    def lut(mm: int):
        sub = F.slice("q", mm * subdim + 1, subdim)
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.lit([int(vv) for vv in cb[mm][k]]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                for k in sorted(cb[mm])
            ]
        ).alias(f"l{mm}")

    qs = ranked.filter(
        (F.col("vec_id") < n_query) & (F.col("rn") <= nprobe)
    ).select(F.col("vec_id").alias("qid"), "cell", *[lut(mm) for mm in range(m)])

    # each database vector lives in exactly one cell, so (qid, nid) pairs
    # are unique across the nprobe probe rows — no dedup needed
    pairs = qs.join(db, "cell").filter(F.col("qid") != F.col("nid"))
    adc = F.element_at(F.col("l0"), F.col("c0") + 1)
    for mm in range(1, m):
        adc = adc + F.element_at(F.col(f"l{mm}"), F.col(f"c{mm}") + 1)
    scored = pairs.select("qid", "nid", adc.cast("long").alias("adc_dist"))
    wr = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("nid").alias("neighbor_id"),
            "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sql_pq_adc_topk(
    table: str = "embeddings",
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    dim: int = DIM,
    nprobe: int = PQ_NPROBE,
    n_query: int = PQ_N_QUERY,
    topk: int = PQ_TOPK,
) -> str:
    """DuckDB mirror: the shared codebook CTEs (+label), per-vector codes
    (fin), per-label integer centroids, coarse cell ranking, then the ADC
    sum as a relational group-sum — query subvectors joined to database
    codes on the subspace index and to the trained codebook on (m, code),
    no LUT materialization needed in SQL."""
    subdim = dim // m
    parts, dist = _sql_pq_parts(table, m, codes, iters, subdim, with_label=True)
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (q.q[i] - c.cvec[i]) * (q.q[i] - c.cvec[i])))"
    )
    return f"""
WITH {', '.join(parts)},
fin AS (
  SELECT sv.vec_id, sv.m, cb.k AS code
  FROM sv JOIN cb{iters} cb ON sv.m = cb.m
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.m
                             ORDER BY {dist}, cb.k) = 1
),
csums AS (
  SELECT label, CAST(generate_subscripts(q, 1) AS INT) AS pos, unnest(q) AS qv
  FROM q
),
cint AS (
  SELECT label, pos,
         (CASE WHEN n < 0 THEN -((2 * abs(n) + d) // (2 * d))
               ELSE ((2 * abs(n) + d) // (2 * d)) END) AS cq
  FROM (SELECT label, pos, SUM(qv) AS n, COUNT(*) AS d FROM csums GROUP BY 1, 2)
),
cents AS (
  SELECT label AS cell, list(cq ORDER BY pos) AS cvec FROM cint GROUP BY label
),
ranked AS (
  SELECT q.vec_id, c.cell,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {d2} ASC, c.cell ASC) AS rn
  FROM q CROSS JOIN cents c
),
adc AS (
  SELECT qs.vec_id AS qid, db.vec_id AS nid, SUM({dist})::BIGINT AS adc_dist
  FROM (SELECT * FROM ranked WHERE rn <= {nprobe} AND vec_id < {n_query}) qs
  JOIN (SELECT * FROM ranked WHERE rn = 1) db
    ON qs.cell = db.cell AND qs.vec_id <> db.vec_id
  JOIN fin f ON f.vec_id = db.vec_id
  JOIN sv ON sv.vec_id = qs.vec_id AND sv.m = f.m
  JOIN cb{iters} cb ON cb.m = f.m AND cb.k = f.code
  GROUP BY 1, 2
)
SELECT vec_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank FROM (
  SELECT qid AS vec_id, nid AS neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY adc_dist ASC, nid ASC) AS rank
  FROM adc
) WHERE rank <= {topk}
"""


# ----------------------------------------------------- PQ recall evaluation
# The rollout-decision relation for quantized serving (the matryoshka
# pattern applied to PQ): IVFADC answers are approximate on TWO axes —
# coarse-cell pruning (nprobe) and code quantization (m, codes) — and
# whether a corpus tolerates the compression is an empirical question a
# pipeline answers before flipping the dial. Per query this reports the
# ANN-benchmark metrics: recall@k of the TRUE nearest neighbour (is the
# exact top-1 anywhere in the ADC top-k?) and the top-k overlap, against
# an exact int64 L2 baseline over the same bounded query set.
#
# 100 TB shape: the ADC side is pq_adc_topk unchanged; the exact baseline
# is the cosine_topk crossJoin shape whose broadcast hint is justified by
# the PQ_N_QUERY cap (a design constant, never corpus-sized); the overlap
# join is queries x 1 rows.


def pq_recall(
    embeddings: DataFrame,
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    dim: int = DIM,
    nprobe: int = PQ_NPROBE,
    n_query: int = PQ_N_QUERY,
    topk: int = PQ_TOPK,
) -> DataFrame:
    """(vec_id, n_common, overlap_milli, top1_kept) — per query: the size
    of ADC-topk ∩ exact-topk, that overlap in milli, and whether the exact
    nearest neighbour survived into the ADC top-k (recall@k of the true
    NN, the headline ANN-benchmark number)."""
    from pyspark.sql import Window

    adc = pq_adc_topk(embeddings, m, codes, iters, dim, nprobe, n_query, topk)
    qz = _quantized(embeddings).drop("h")
    # bounded query side: n_query is a hard design cap (cosine_topk's
    # justification), so the hint cannot force an unbounded materialization
    qs = F.broadcast(
        qz.filter(F.col("vec_id") < n_query).select(
            F.col("vec_id").alias("qid"), F.col("q").alias("qv")
        )
    )
    cand = qz.select(F.col("vec_id").alias("nid"), F.col("q").alias("nv"))
    d2 = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("nid"))
    exact = (
        qs.crossJoin(cand)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )
    e = exact.groupBy("qid").agg(
        F.array_sort(F.collect_list("nid")).alias("ex_ids"),
        F.max(F.when(F.col("rank") == 1, F.col("nid"))).alias("top1"),
    )
    a = adc.groupBy(F.col("vec_id").alias("qid")).agg(
        F.array_sort(F.collect_list("neighbor_id")).alias("adc_ids")
    )
    j = e.join(a, "qid", "left").select(
        F.col("qid").alias("vec_id"),
        "ex_ids",
        "top1",
        F.coalesce("adc_ids", F.array().cast("array<long>")).alias("adc_ids"),
    )
    hits = F.size(F.array_intersect("ex_ids", "adc_ids")).cast("long")
    return j.select(
        "vec_id",
        hits.alias("n_common"),
        F.expr(
            f"CASE WHEN size(ex_ids) > 0 THEN (1000 * size(array_intersect"
            f"(ex_ids, adc_ids))) div size(ex_ids) ELSE 0 END"
        ).cast("long").alias("overlap_milli"),
        F.array_contains("adc_ids", F.col("top1")).alias("top1_kept"),
    )


def sql_pq_recall(
    table: str = "embeddings",
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    dim: int = DIM,
    nprobe: int = PQ_NPROBE,
    n_query: int = PQ_N_QUERY,
    topk: int = PQ_TOPK,
) -> str:
    """DuckDB mirror: the pq_adc_topk mirror as a CTE, an exact int64 L2
    top-k baseline over the same quantization, list intersection."""
    adc = sql_pq_adc_topk(table, m, codes, iters, dim, nprobe, n_query, topk)
    qexpr = (
        f"list_transform(embedding, "
        f"e -> CAST(floor((e::DOUBLE + 1.0) * {FIXED_SCALE}) AS BIGINT))"
    )
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (q.q[i] - c.q[i]) * (q.q[i] - c.q[i])))"
    )
    return f"""
WITH adc AS ({adc}),
qz AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {qexpr} AS q FROM {table}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid, {d2} AS d2
  FROM qz q JOIN qz c ON q.vec_id < {n_query} AND q.vec_id <> c.vec_id
),
exact AS (
  SELECT * FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2 ASC, nid ASC) AS rank
    FROM scored
  ) WHERE rank <= {topk}
),
e AS (
  SELECT qid, list_sort(list(nid)) AS ex_ids,
         MAX(CASE WHEN rank = 1 THEN nid END) AS top1
  FROM exact GROUP BY qid
),
a AS (
  SELECT vec_id AS qid, list_sort(list(neighbor_id)) AS adc_ids
  FROM adc GROUP BY vec_id
)
SELECT e.qid AS vec_id,
       CAST(len(list_intersect(e.ex_ids, COALESCE(a.adc_ids, []))) AS BIGINT)
         AS n_common,
       CAST(CASE WHEN len(e.ex_ids) > 0
                 THEN (1000 * len(list_intersect(e.ex_ids,
                        COALESCE(a.adc_ids, [])))) // len(e.ex_ids)
                 ELSE 0 END AS BIGINT) AS overlap_milli,
       list_contains(COALESCE(a.adc_ids, []), e.top1) AS top1_kept
FROM e LEFT JOIN a USING (qid)
"""


# ------------------------------------------------- per-dimension moments
def dim_stats(embeddings: DataFrame, dim: int = DIM) -> DataFrame:
    """(dim, n, mean_micro, var_micro2) — per-dimension mean/variance of
    the embedding column in exact int64 fixed point: the whitening /
    feature-health relation (dead dims show var ~ 0, scale-skewed dims
    dominate L2 and should be rescaled before IVF/k-means).

    Scale shape: ONE aggregation producing a single row of 2*dim int64
    sums (elementwise element_at — the vector column is never exploded,
    so no shuffle rows scale with dim), then an in-row explode of dim
    constant structs. Variance is computed on CENTERED values
    (c = q - FIXED_SCALE, i.e. the raw coordinate) so the exact
    numerator n*ssq - s^2 stays inside int64 for |x| <~ 0.25 up to
    n ~ 10^8 vectors per exact pass; past that the documented dial is
    per-shard (n, s, ssq) partials (all additive) merged in decimal —
    same relation, hierarchical combine. mean_micro is reported on the
    non-negative quantized domain (q = floor((x+1)*10^6)), so truncating
    div == floor div in both engines."""
    q = F.transform(
        "embedding",
        lambda e: F.floor(
            (e.cast("double") + F.lit(1.0)) * FIXED_SCALE
        ).cast("long"),
    )
    base = embeddings.select(q.alias("q"))
    # the centered first moment is DERIVED (sc = s - n*SCALE), not
    # aggregated: 2*dim+1 agg expressions instead of 3*dim+1 — measured
    # ~25% off the codegen-dominated sandbox wall at identical output
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(dim):
        c = F.element_at("q", i + 1) - F.lit(FIXED_SCALE).cast("long")
        aggs += [
            F.sum(F.element_at("q", i + 1)).alias(f"s{i}"),
            F.sum(c * c).alias(f"ss{i}"),
        ]
    one = base.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("dim"),
                F.expr(f"s{i} div n").alias("mean_micro"),
                F.expr(
                    f"(n * ss{i} - (s{i} - n * {FIXED_SCALE})"
                    f" * (s{i} - n * {FIXED_SCALE})) div (n * n)"
                ).alias("var_micro2"),
            )
            for i in range(dim)
        ]
    )
    return (
        one.select("n", F.explode(rows).alias("r"))
        .select("r.dim", "n", "r.mean_micro", "r.var_micro2")
        .orderBy("dim")
    )


def sql_dim_stats(table: str = "embeddings", dim: int = DIM) -> str:
    """DuckDB mirror of dim_stats."""
    qexpr = (
        "list_transform(embedding, "
        f"e -> CAST(floor((CAST(e AS DOUBLE) + 1.0) * {FIXED_SCALE}) AS BIGINT))"
    )
    cells = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(dim):
        cells += [
            f"CAST(SUM(q[{i + 1}]) AS BIGINT) AS s{i}",
            f"CAST(SUM((q[{i + 1}] - {FIXED_SCALE}) * (q[{i + 1}] - {FIXED_SCALE}))"
            f" AS BIGINT) AS ss{i}",
        ]
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS dim, n,"
        f" CAST(s{i} // n AS BIGINT) AS mean_micro,"
        f" CAST((n * ss{i} - (s{i} - n * {FIXED_SCALE})"
        f" * (s{i} - n * {FIXED_SCALE})) // (n * n) AS BIGINT) AS var_micro2"
        " FROM agg"
        for i in range(dim)
    )
    return f"""
WITH q AS (SELECT {qexpr} AS q FROM {table}),
agg AS (SELECT {', '.join(cells)} FROM q)
{rows}
ORDER BY dim
"""


# ------------------------------------------------ split-half centroid drift
def centroid_drift(embeddings: DataFrame, dim: int = DIM) -> DataFrame:
    """(label, n_a, n_b, d2, drift_micro2) — split-half reliability of the
    per-label centroids: the exact int64 squared L2 between the centroid
    computed on md5-half A of each label's vectors and the one from half
    B. A stable, well-populated label drifts ~ sampling noise; a label
    whose halves disagree is either too thin to trust (n_a/n_b say which)
    or contaminated by a corrupt encoder run (the embed_outliers sweep
    localizes it). drift_micro2 = d2 div dim, the per-dimension mean.

    100 TB shape: ONE groupBy(label, half) with 2*|labels| groups and dim
    elementwise int64 sums (no vector explode), then a |labels|-sized
    self-join of the two half relations. Same quantization and truncating
    integer mean as every sibling (non-negative domain: div == floor)."""
    q = F.transform(
        "embedding",
        lambda e: F.floor(
            (e.cast("double") + F.lit(1.0)) * FIXED_SCALE
        ).cast("long"),
    )
    half = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cd|"), F.col("vec_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    base = embeddings.select("label", half.alias("h"), q.alias("q"))
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)]
    g = base.groupBy("label", "h").agg(*aggs)
    cent = g.select(
        "label",
        "h",
        "n",
        F.array(*[F.expr(f"s{i} div n") for i in range(dim)]).alias("m"),
    )
    a = cent.filter(F.col("h") == 0).select(
        "label", F.col("n").alias("n_a"), F.col("m").alias("ma")
    )
    b = cent.filter(F.col("h") == 1).select(
        "label", F.col("n").alias("n_b"), F.col("m").alias("mb")
    )
    d2 = F.aggregate(
        F.zip_with("ma", "mb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, "label")
        .select(
            F.col("label").cast("long").alias("label"),
            "n_a",
            "n_b",
            d2.alias("d2"),
        )
        .select(
            "label",
            "n_a",
            "n_b",
            "d2",
            F.expr(f"d2 div {dim}").cast("long").alias("drift_micro2"),
        )
        .orderBy("label")
    )


def sql_centroid_drift(table: str = "embeddings", dim: int = DIM) -> str:
    """DuckDB mirror of centroid_drift."""
    qexpr = (
        "list_transform(embedding, "
        f"e -> CAST(floor((CAST(e AS DOUBLE) + 1.0) * {FIXED_SCALE}) AS BIGINT))"
    )
    half = (
        "(('0x' || substr(md5('cd|' || CAST(vec_id AS VARCHAR)), 1, 4))"
        "::BIGINT % 2)"
    )
    return f"""
WITH base AS (
  SELECT label, {half} AS h, {qexpr} AS q FROM {table}
),
cells AS (
  SELECT label, h, CAST(generate_subscripts(q, 1) AS INT) AS d, unnest(q) AS v
  FROM base
),
cent AS (
  SELECT label, h, d, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY label, h, d
),
a AS (SELECT label, d, m, n FROM cent WHERE h = 0),
b AS (SELECT label, d, m, n FROM cent WHERE h = 1)
SELECT CAST(a.label AS BIGINT) AS label,
       CAST(MAX(a.n) AS BIGINT) AS n_a,
       CAST(MAX(b.n) AS BIGINT) AS n_b,
       CAST(SUM((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS d2,
       CAST(SUM((a.m - b.m) * (a.m - b.m)) // {dim} AS BIGINT)
         AS drift_micro2
FROM a JOIN b ON a.label = b.label AND a.d = b.d
GROUP BY a.label
ORDER BY label
"""
