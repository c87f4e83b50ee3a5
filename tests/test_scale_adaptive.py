"""Scale-adaptive LSH key spaces (round-2 judge finding #1).

A STATIC band key space saturates: once the corpus outgrows
keys * max_bucket, every bucket exceeds the width cap, the cap trims
everything (reported, never silent — but useless), and near-dup recall
decays to zero. The fix is parameterization: the key space must grow with
the corpus (keys >= n / target_width), which keeps the expected bucket
width — and with it the trimmed fraction — flat at any scale.

These tests prove exactly that contract, at test scale (the auto rule is
scale-free; production floors 2^15 simhash keys / 2^12 ANN keys only move
where adaptation starts — ~10^6 docs / ~10^5 vectors):

- auto-sized key spaces keep the trimmed-row fraction < 5% AND planted
  near-dup recall >= 0.9 at BOTH 1x and 10x corpus;
- the 1x-adequate static key space collapses at 10x (trim >> 5%, recall
  < 0.5) — the failure mode the adaptation removes;
- the auto rules themselves are monotone and hit the documented
  breakpoints.
"""

import numpy as np
import pandas as pd
import pytest

from pdfextract_spark.functions import dedup, similarity

# test-scale knobs: same rule as production, smaller floor/target so the
# adaptation is exercised with corpora a unit test can afford
N1 = 300                 # 1x corpus size
SCALE = 10               # the judge's 10x replication factor
N_PLANTED = 30           # planted near-dup pairs per corpus
TARGET = 4.0             # target bucket width (prod: 32)
MIN_BITS = 4             # test floor (prod: 15 simhash / 12 ANN)
STATIC_BITS = 4          # the "round-1 style" fixed key space under attack


# ------------------------------------------------------------- auto rules


def test_simhash_band_bits_rule():
    f = dedup.simhash_band_bits
    # production floor holds for every driver scale factor
    assert f(500) == dedup.SIMHASH_MIN_BAND_BITS
    assert f(5_000) == dedup.SIMHASH_MIN_BAND_BITS
    # breakpoint: adaptation starts past floor_keys * target_width
    assert f(2**15 * 32) == 15
    assert f(2**15 * 32 + 1) == 16
    # monotone, clamped at the two-word ceiling
    assert f(10**9) == 25
    assert f(10**12) == dedup.SIMHASH_MAX_BAND_BITS
    # test-scale parameters
    assert f(N1, target_width=TARGET, min_bits=MIN_BITS) == 7
    assert f(N1 * SCALE, target_width=TARGET, min_bits=MIN_BITS) == 10


def test_ann_planes_rule():
    f = similarity.ann_planes
    assert f(640) == similarity.N_PLANES
    assert f(2**12 * 32) == 12
    assert f(2**12 * 32 + 1) == 13
    assert f(10**9) == 25
    assert f(10**12) == similarity.ANN_MAX_PLANES
    assert f(N1, target_width=TARGET, min_planes=MIN_BITS) == 7
    assert f(N1 * SCALE, target_width=TARGET, min_planes=MIN_BITS) == 10


# --------------------------------------------------------------- corpora


def _doc_corpus(n: int, seed: int) -> pd.DataFrame:
    """n docs of 40 random tokens each (mutually unrelated), with the first
    2*N_PLANTED docs forming N_PLANTED planted near-dup pairs: doc 2i+1 is
    doc 2i with ONE token replaced (high-cosine / low-hamming regime)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = [f"w{v}" for v in rng.integers(0, 5_000_000, size=40)]
        rows.append({"doc_id": f"d{i:06d}", "text": " ".join(toks)})
    for p in range(N_PLANTED):
        src = rows[2 * p]["text"].split()
        src[7] = f"w{rng.integers(5_000_000, 6_000_000)}"
        rows[2 * p + 1]["text"] = " ".join(src)
    return pd.DataFrame(rows)


def _vec_corpus(n: int, seed: int) -> pd.DataFrame:
    """n random unit vectors; first 2*N_PLANTED rows are N_PLANTED planted
    pairs at cos ~ 0.984 (the regime hyperplane LSH is designed for)."""
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, similarity.DIM))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    for p in range(N_PLANTED):
        v = V[2 * p]
        g = rng.standard_normal(similarity.DIM)
        g -= g.dot(v) * v
        g /= np.linalg.norm(g)
        V[2 * p + 1] = v + 0.18 * g
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in V],
            "label": np.zeros(n, dtype=np.int64),
        }
    )


def _planted_recall(found_pairs, id_of) -> float:
    found = set(found_pairs)
    hits = sum((id_of(2 * p), id_of(2 * p + 1)) in found for p in range(N_PLANTED))
    return hits / N_PLANTED


# ---------------------------------------------------------------- simhash


def _simhash_run(spark, pdf: pd.DataFrame, band_bits):
    df = spark.createDataFrame(pdf)
    pairs = dedup.simhash_neardups(
        df, band_bits=band_bits, target_width=TARGET, min_bits=MIN_BITS
    ).toPandas()
    hot = dedup.simhash_oversized_buckets(
        df, band_bits=band_bits, target_width=TARGET, min_bits=MIN_BITS
    ).toPandas()
    trimmed = hot["width"].sum() / (len(pdf) * dedup.SIMHASH_BANDS)
    recall = _planted_recall(
        zip(pairs["doc_a"], pairs["doc_b"]), lambda i: f"d{i:06d}"
    )
    return trimmed, recall


@pytest.mark.parametrize("n", [N1, N1 * SCALE], ids=["1x", "10x"])
def test_simhash_auto_keyspace_holds(spark, n):
    trimmed, recall = _simhash_run(spark, _doc_corpus(n, seed=17), band_bits=None)
    assert trimmed < 0.05, f"trimmed fraction {trimmed:.3f} at n={n}"
    assert recall >= 0.9, f"planted recall {recall:.2f} at n={n}"


def test_simhash_static_keyspace_collapses_at_10x(spark):
    # the static layout is fine at 1x ...
    trimmed1, recall1 = _simhash_run(spark, _doc_corpus(N1, seed=17), STATIC_BITS)
    assert recall1 >= 0.9 and trimmed1 < 0.5
    # ... and saturates at 10x: most rows live in over-cap buckets, recall dies
    trimmed, recall = _simhash_run(
        spark, _doc_corpus(N1 * SCALE, seed=17), STATIC_BITS
    )
    assert trimmed > 0.5, f"expected saturation, trimmed={trimmed:.3f}"
    assert recall < 0.5, f"expected recall collapse, recall={recall:.2f}"


# -------------------------------------------------------------------- ANN


def _ann_run(spark, pdf: pd.DataFrame, n_planes):
    df = spark.createDataFrame(pdf)
    pairs = similarity.ann_lsh_pairs(
        df, n_planes=n_planes, target_width=TARGET, min_planes=MIN_BITS
    ).toPandas()
    hot = similarity.ann_oversized_buckets(
        df, n_planes=n_planes, target_width=TARGET, min_planes=MIN_BITS
    ).toPandas()
    trimmed = hot["width"].sum() / (len(pdf) * similarity.N_TABLES)
    recall = _planted_recall(
        zip(pairs["vec_id_a"], pairs["vec_id_b"]), lambda i: i
    )
    return trimmed, recall


@pytest.mark.parametrize("n", [N1, N1 * SCALE], ids=["1x", "10x"])
def test_ann_auto_keyspace_holds(spark, n):
    trimmed, recall = _ann_run(spark, _vec_corpus(n, seed=23), n_planes=None)
    assert trimmed < 0.05, f"trimmed fraction {trimmed:.3f} at n={n}"
    assert recall >= 0.9, f"planted recall {recall:.2f} at n={n}"


def test_ann_static_keyspace_collapses_at_10x(spark):
    trimmed1, recall1 = _ann_run(spark, _vec_corpus(N1, seed=23), STATIC_BITS)
    assert recall1 >= 0.9 and trimmed1 < 0.5
    trimmed, recall = _ann_run(spark, _vec_corpus(N1 * SCALE, seed=23), STATIC_BITS)
    assert trimmed > 0.5, f"expected saturation, trimmed={trimmed:.3f}"
    assert recall < 0.5, f"expected recall collapse, recall={recall:.2f}"


# ---------------------------------------------- default layout unchanged


def test_default_layouts_bit_identical_to_round2(spark):
    """The adaptive machinery must not move the proven production floor:
    at driver scale the auto rule picks exactly the round-2 layout, so the
    default-config surfaces (and their DuckDB oracles) are unchanged."""
    assert dedup.simhash_band_bits(500) == 15
    assert similarity.ann_planes(640) == 12
    pdf = _doc_corpus(60, seed=3)
    df = spark.createDataFrame(pdf)
    auto = dedup.simhash_neardups(df).toPandas()
    fixed = dedup.simhash_neardups(df, band_bits=15).toPandas()
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b", "hamming"]].values))
    assert key(auto) == key(fixed)
