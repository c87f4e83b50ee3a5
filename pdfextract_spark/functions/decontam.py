"""Benchmark decontamination: flag training documents that share long
word n-grams with a held-out benchmark/eval set.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM-style
13-gram decontamination, here n=8 on the sandbox's short documents): build
the distinct n-gram set of the benchmark documents, then count, per
training document, how many of its distinct n-grams appear in that set.

Spark shape (100 TB): benchmark sets are SMALL by nature (thousands of eval
documents vs 10^12 training docs), so the benchmark gram set is built with
one tiny aggregation and BROADCAST into the scan of the training side —
the training corpus is never shuffled. Per-doc gram hit counts aggregate
on doc_id only for docs with >=1 hit (a tiny table), then broadcast-join
back onto the training scan for the zero rows. Zero wide shuffles of the
corpus.

Sandbox synthesis (same pattern as htmlops/webclean: the operators exist
for structure the flat corpus lacks): a fixed benchmark passage is appended
to every benchmark doc AND to an md5-selected ~1/8 of training docs — the
planted contamination the detector must recover exactly; the DuckDB oracle
rebuilds the same corpus byte-exact and recomputes hits independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BENCH_PCT = 5  # md5 bucket < 5 of 100 -> benchmark member (~5% of docs)
PLANT_MOD = 8  # 1 in 8 non-benchmark docs gets the passage planted
NGRAM = 8
PASSAGE = (
    "the quick brown fox jumps over the lazy dog while the curious cat watches"
)


def synthesize_eval_split(documents: DataFrame) -> DataFrame:
    """(doc_id, role, text2) — deterministic benchmark/train split with
    planted contamination. role='bench': md5 bucket < BENCH_PCT, passage
    appended. role='train': the rest; passage appended iff a second
    md5 draw % PLANT_MOD == 0 (the planted positives)."""
    doc_id = F.col("doc_id").cast("string")
    h = F.md5(F.concat(F.lit("eval|"), doc_id))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 100
    plant = F.conv(F.substring(h, 5, 4), 16, 10).cast("long") % PLANT_MOD == 0
    is_bench = bucket < BENCH_PCT
    text2 = F.when(
        is_bench | plant, F.concat(F.col("text"), F.lit(" " + PASSAGE))
    ).otherwise(F.col("text"))
    return documents.select(
        doc_id.alias("doc_id"),
        F.when(is_bench, F.lit("bench")).otherwise(F.lit("train")).alias("role"),
        text2.alias("text2"),
    )


def _grams(text_col, n: int):
    words = F.split(text_col, " ")
    k = F.size(words) - n + 1
    return F.when(
        k >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_report(split: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every role='train' doc: how many
    of its distinct word n-grams appear in the benchmark gram set."""
    bench_grams = (
        split.filter(F.col("role") == "bench")
        .select(F.explode(_grams(F.col("text2"), n)).alias("gram"))
        .distinct()
    )
    train = split.filter(F.col("role") == "train")
    hits = (
        train.select("doc_id", F.explode(_grams(F.col("text2"), n)).alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        train.select("doc_id")
        # no broadcast hint on hits: contaminated-doc count is unbounded in
        # corpus size (unlike the bench gram set above, which is bounded by
        # the benchmark's nature); AQE broadcasts at runtime when small
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def _sql_split(table: str) -> str:
    h = "md5('eval|' || CAST(doc_id AS VARCHAR))"
    bucket = f"(('0x' || substr({h}, 1, 4))::BIGINT % 100)"
    plant = f"(('0x' || substr({h}, 5, 4))::BIGINT % {PLANT_MOD}) = 0"
    return f"""
split AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN {bucket} < {BENCH_PCT} THEN 'bench' ELSE 'train' END AS role,
         CASE WHEN {bucket} < {BENCH_PCT} OR {plant}
              THEN text || ' {PASSAGE}' ELSE text END AS text2
  FROM {table})"""


def _sql_grams(text_expr: str, n: int) -> str:
    words = f"string_split({text_expr}, ' ')"
    k = f"(len({words}) - {n} + 1)"
    return (
        f"(CASE WHEN {k} >= 1 THEN list_distinct(list_transform(range(1, {k} + 1), "
        f"i -> array_to_string(list_slice({words}, i, i + {n} - 1), ' '))) "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def sql_synthesize_eval_split(table: str = "documents") -> str:
    return f"WITH {_sql_split(table)} SELECT doc_id, role, text2 FROM split"


def sql_contamination_report(table: str = "documents", n: int = NGRAM) -> str:
    return f"""
WITH {_sql_split(table)},
bg AS (
  SELECT DISTINCT unnest({_sql_grams('text2', n)}) AS gram
  FROM split WHERE role = 'bench'),
tg AS (
  SELECT doc_id, unnest({_sql_grams('text2', n)}) AS gram
  FROM split WHERE role = 'train'),
hits AS (
  SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM tg JOIN bg USING (gram) GROUP BY tg.doc_id)
SELECT s.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM split s LEFT JOIN hits h ON s.doc_id = h.doc_id
WHERE s.role = 'train' ORDER BY s.doc_id
"""


# ------------------------------- perturbation-robust (fuzzy) decontamination
# The exact n-gram pass above misses contamination that was lightly edited
# (reformatting, tokenizer drift, paraphrase tools): swap ONE token per 7
# and every 8-gram is broken. The fuzzy pass counts shared 3-gram SHINGLES
# against the benchmark shingle set instead — a deterministic containment
# signal that survives sparse edits (4/7 of shingles outlive a period-7
# perturbation). Same 100 TB shape as the exact pass: the benchmark shingle
# set is bounded by the benchmark's nature and broadcast; the corpus is
# never shuffled; per-doc counts aggregate on doc_id for hit docs only.

FUZZY_N = 3           # shingle width (< perturbation period, so some survive)
FUZZY_MIN_SHARED = 6  # shared-shingle floor for the contaminated flag
PERTURB_MOD = 7       # one swapped token per 7 — every exact 8-gram broken
P3 = " ".join([PASSAGE] * 3)


def synthesize_perturbed_leaks(documents: DataFrame) -> DataFrame:
    """(doc_id, role, text2) — bench docs ARE the passage (benchmark items
    carry their own text); leaked train docs (1 in PLANT_MOD) append a
    PERTURBED copy where token i % PERTURB_MOD == 0 is swapped for a
    doc-unique z-token, so NO exact 8-gram survives while most 3-gram
    shingles do. Clean train docs keep their original text (vocabulary
    disjoint from the passage — zero fuzzy hits by construction)."""
    doc_id = F.col("doc_id").cast("string")
    h = F.md5(F.concat(F.lit("fuzzy|"), doc_id))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 100
    plant = F.conv(F.substring(h, 5, 4), 16, 10).cast("long") % PLANT_MOD == 0
    is_bench = bucket < BENCH_PCT
    perturbed = F.array_join(
        F.transform(
            F.split(F.lit(P3), " "),
            lambda t, i: F.when(
                i % PERTURB_MOD == 0,
                F.concat(
                    F.lit("z"),
                    F.substring(
                        F.md5(F.concat(doc_id, F.lit("|"), i.cast("string"))),
                        1,
                        3,
                    ),
                ),
            ).otherwise(t),
        ),
        " ",
    )
    text2 = (
        F.when(is_bench, F.lit(P3))
        .when(plant, F.concat(F.col("text"), F.lit(" "), perturbed))
        .otherwise(F.col("text"))
    )
    return documents.select(
        doc_id.alias("doc_id"),
        F.when(is_bench, F.lit("bench")).otherwise(F.lit("train")).alias("role"),
        text2.alias("text2"),
    )


def fuzzy_contamination_report(
    split: DataFrame, n: int = FUZZY_N, min_shared: int = FUZZY_MIN_SHARED
) -> DataFrame:
    """(doc_id, n_shared, n_exact_hits, fuzzy_contaminated) per train doc:
    shared FUZZY_N-gram shingles vs the benchmark shingle set, next to the
    exact NGRAM-gram hit count on the SAME corpus — 0 for every perturbed
    plant, which is precisely the evasion this pass exists to catch."""
    bench_sh = (
        split.filter(F.col("role") == "bench")
        .select(F.explode(_grams(F.col("text2"), n)).alias("gram"))
        .distinct()
    )
    bench_ex = (
        split.filter(F.col("role") == "bench")
        .select(F.explode(_grams(F.col("text2"), NGRAM)).alias("gram"))
        .distinct()
    )
    train = split.filter(F.col("role") == "train")
    shared = (
        train.select("doc_id", F.explode(_grams(F.col("text2"), n)).alias("gram"))
        .join(F.broadcast(bench_sh), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    exact = (
        train.select(
            "doc_id", F.explode(_grams(F.col("text2"), NGRAM)).alias("gram")
        )
        .join(F.broadcast(bench_ex), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_exact_hits"))
    )
    return (
        train.select("doc_id")
        # no hint on the per-doc hit relations (unbounded in corpus size)
        .join(shared, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.coalesce("n_exact_hits", F.lit(0)).cast("long").alias("n_exact_hits"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias(
                "fuzzy_contaminated"
            ),
        )
        .orderBy("doc_id")
    )


def _sql_fuzzy_split(table: str) -> str:
    h = "md5('fuzzy|' || CAST(doc_id AS VARCHAR))"
    bucket = f"(('0x' || substr({h}, 1, 4))::BIGINT % 100)"
    plant = f"(('0x' || substr({h}, 5, 4))::BIGINT % {PLANT_MOD}) = 0"
    ws = f"string_split('{P3}', ' ')"
    perturbed = (
        f"array_to_string(list_transform(range(1, len({ws}) + 1), "
        f"i -> CASE WHEN (i - 1) % {PERTURB_MOD} = 0 "
        f"THEN 'z' || substr(md5(CAST(doc_id AS VARCHAR) || '|' "
        f"|| CAST(i - 1 AS VARCHAR)), 1, 3) "
        f"ELSE {ws}[i] END), ' ')"
    )
    return f"""
split AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN {bucket} < {BENCH_PCT} THEN 'bench' ELSE 'train' END AS role,
         CASE WHEN {bucket} < {BENCH_PCT} THEN '{P3}'
              WHEN {plant} THEN text || ' ' || {perturbed}
              ELSE text END AS text2
  FROM {table})"""


def sql_fuzzy_contamination_report(
    table: str = "documents", n: int = FUZZY_N, min_shared: int = FUZZY_MIN_SHARED
) -> str:
    return f"""
WITH {_sql_fuzzy_split(table)},
bsh AS (
  SELECT DISTINCT unnest({_sql_grams('text2', n)}) AS gram
  FROM split WHERE role = 'bench'),
bex AS (
  SELECT DISTINCT unnest({_sql_grams('text2', NGRAM)}) AS gram
  FROM split WHERE role = 'bench'),
tsh AS (
  SELECT doc_id, unnest({_sql_grams('text2', n)}) AS gram
  FROM split WHERE role = 'train'),
tex AS (
  SELECT doc_id, unnest({_sql_grams('text2', NGRAM)}) AS gram
  FROM split WHERE role = 'train'),
hs AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM tsh JOIN bsh USING (gram) GROUP BY doc_id),
he AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_exact_hits
  FROM tex JOIN bex USING (gram) GROUP BY doc_id)
SELECT s.doc_id,
       COALESCE(hs.n_shared, 0) AS n_shared,
       COALESCE(he.n_exact_hits, 0) AS n_exact_hits,
       COALESCE(hs.n_shared, 0) >= {min_shared} AS fuzzy_contaminated
FROM split s LEFT JOIN hs ON s.doc_id = hs.doc_id
             LEFT JOIN he ON s.doc_id = he.doc_id
WHERE s.role = 'train' ORDER BY s.doc_id
"""


# ------------------------------------------- contamination attribution
# The eval-side complement of contamination_report: for each BENCHMARK
# item, WHICH training documents share its n-grams and how much of the
# item they cover. contamination_report answers "is this train doc dirty";
# this answers the eval-integrity question "is this benchmark item still
# measurable, and which corpus docs leak it" — the relation an eval-suite
# owner reads before trusting a score (and the audit trail a takedown
# request needs).
#
# Scale shape: the bench gram relation keeps its doc_id (still
# benchmark-bounded, broadcast like the report's gram set); the train
# corpus explodes once and joins on gram — never shuffled on its own key.
# The per-bench-item candidate set IS corpus-scaled (every planted copy
# matches every bench item), so the top-K is the bm25 SALTED TWO-STAGE
# ranking: no reducer ever sorts a whole bench item's candidates; bucket-
# local top-K then global top-K over <= salt*K survivors is exact.

ATTR_TOPK = 3
ATTR_SALT = 8


def contamination_attribution(
    split: DataFrame, n: int = NGRAM, topk: int = ATTR_TOPK, salt: int = ATTR_SALT
) -> DataFrame:
    """(bench_id, rank, train_id, shared_grams, bench_grams,
    coverage_milli) — per benchmark item, the top-`topk` training docs by
    shared distinct n-grams (ties to the smaller train_id), with the
    fraction of the item's grams they cover."""
    from pyspark.sql import Window

    bench = split.filter(F.col("role") == "bench").select(
        F.col("doc_id").alias("bench_id"),
        _grams(F.col("text2"), n).alias("grams"),
    )
    bench_sizes = bench.select(
        "bench_id", F.size("grams").cast("long").alias("bench_grams")
    )
    bench_rel = bench.select("bench_id", F.explode("grams").alias("gram"))
    train_rel = split.filter(F.col("role") == "train").select(
        F.col("doc_id").alias("train_id"),
        F.explode(_grams(F.col("text2"), n)).alias("gram"),
    )
    shared = (
        train_rel.join(F.broadcast(bench_rel), "gram")
        .groupBy("bench_id", "train_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )
    order = [F.desc("shared_grams"), F.asc("train_id")]
    w1 = Window.partitionBy("bench_id", "_salt").orderBy(*order)
    s1 = (
        shared.withColumn("_salt", F.pmod(F.crc32(F.col("train_id")), F.lit(salt)))
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= topk)
    )
    w2 = Window.partitionBy("bench_id").orderBy(*order)
    return (
        s1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= topk)
        .join(F.broadcast(bench_sizes), "bench_id")
        .select(
            "bench_id",
            "rank",
            "train_id",
            "shared_grams",
            "bench_grams",
            F.expr("(1000 * shared_grams) div bench_grams").cast("long").alias(
                "coverage_milli"
            ),
        )
    )


def sql_contamination_attribution(
    table: str = "documents", n: int = NGRAM, topk: int = ATTR_TOPK
) -> str:
    """DuckDB mirror: identical split/grams; the salted two-stage top-k
    collapses to one window rank (exactness is the salt-invariance
    argument, tested on the Spark side)."""
    return f"""
WITH {_sql_split(table)},
bench AS (
  SELECT doc_id AS bench_id, {_sql_grams('text2', n)} AS grams
  FROM split WHERE role = 'bench'),
bsz AS (SELECT bench_id, CAST(len(grams) AS BIGINT) AS bench_grams FROM bench),
brel AS (SELECT bench_id, unnest(grams) AS gram FROM bench),
trel AS (
  SELECT doc_id AS train_id, unnest({_sql_grams('text2', n)}) AS gram
  FROM split WHERE role = 'train'),
shared AS (
  SELECT b.bench_id, t.train_id, CAST(COUNT(*) AS BIGINT) AS shared_grams
  FROM trel t JOIN brel b USING (gram)
  GROUP BY 1, 2),
ranked AS (
  SELECT bench_id, train_id, shared_grams,
         ROW_NUMBER() OVER (PARTITION BY bench_id
                            ORDER BY shared_grams DESC, train_id ASC) AS rank
  FROM shared)
SELECT r.bench_id, CAST(r.rank AS BIGINT) AS rank, r.train_id,
       r.shared_grams, s.bench_grams,
       CAST((1000 * r.shared_grams) // s.bench_grams AS BIGINT)
         AS coverage_milli
FROM ranked r JOIN bsz s USING (bench_id)
WHERE r.rank <= {topk}
"""
