"""Recall and cap-reporting contracts for the ANN surfaces.

- ann_lsh_pairs: >=0.9 of PLANTED near-duplicate vector pairs (cos >= ~0.98)
  recovered — the regime multi-table hyperplane LSH is designed for. (On the
  driver fixture's near-random vectors no sublinear ANN retains top-k recall;
  that regime is cosine_topk / ivf_topk's.)
- ivf_topk: >=0.9 recall of the true top-3 on clustered data with the default
  multi-probe setting.
- both capped surfaces REPORT oversized buckets instead of silently dropping.
"""

import numpy as np
import pandas as pd
import pytest

from pdfextract_spark.functions import dedup, similarity

DIM = similarity.DIM


def _df(spark, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": np.zeros(len(vecs), dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf)


def test_ann_lsh_recall_on_planted_neardups(spark):
    rng = np.random.default_rng(5)
    n_pairs = 40
    vecs = []
    for _ in range(n_pairs):
        v = rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        g = rng.standard_normal(DIM)
        g -= g.dot(v) * v
        g /= np.linalg.norm(g)
        w = v + 0.18 * g  # cos(v, w) ~ 0.984
        vecs.append(v)
        vecs.append(w)
    out = similarity.ann_lsh_pairs(_df(spark, vecs)).toPandas()
    found = set(zip(out["vec_id_a"], out["vec_id_b"]))
    planted = [(2 * i, 2 * i + 1) for i in range(n_pairs)]
    recall = sum(p in found for p in planted) / n_pairs
    assert recall >= 0.9, f"planted near-dup recall {recall}"
    # re-rank is exact: every reported planted pair has high cosine
    hit = out[[(a, b) in set(planted) for a, b in zip(out.vec_id_a, out.vec_id_b)]]
    assert (hit["cos_sim"] >= 0.95).all()


def test_ann_oversized_buckets_reported(spark):
    rng = np.random.default_rng(9)
    v = rng.standard_normal(DIM)
    dupes = [v.copy() for _ in range(similarity.ANN_MAX_BUCKET + 6)]
    df = _df(spark, dupes)
    report = similarity.ann_oversized_buckets(df).toPandas()
    # identical vectors share every bucket -> every table reports one hot bucket
    assert len(report) == similarity.N_TABLES
    assert (report["width"] == len(dupes)).all()
    # and the capped pair surface drops them (reported, not silent)
    assert len(similarity.ann_lsh_pairs(df).toPandas()) == 0


def test_ivf_topk_recall_on_clustered_data(spark):
    rng = np.random.default_rng(11)
    n_clusters, per = 10, 12
    vecs, labels = [], []
    for c in range(n_clusters):
        center = rng.standard_normal(DIM)
        center /= np.linalg.norm(center)
        for _ in range(per):
            vecs.append(center + 0.15 * rng.standard_normal(DIM))
            labels.append(c)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": np.array(labels, dtype=np.int64),
        }
    )
    df = spark.createDataFrame(pdf)
    got = similarity.ivf_topk(df).toPandas()

    V = np.stack(vecs)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    np.fill_diagonal(S, -2)
    hits = tot = 0
    for qid in range(similarity.N_QUERY):
        if qid >= len(vecs):
            break
        true3 = set(np.argsort(-S[qid])[:3])
        mine = set(got[got.vec_id == qid]["neighbor_id"])
        tot += len(true3)
        hits += len(true3 & mine)
    assert tot > 0
    recall = hits / tot
    assert recall >= 0.9, f"ivf multi-probe recall {recall}"


def test_simhash_oversized_buckets_reported(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [{"doc_id": f"d{i:03d}", "text": text} for i in range(dedup.SIMHASH_MAX_BUCKET + 6)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    report = dedup.simhash_oversized_buckets(df).toPandas()
    # identical docs share every band bucket -> all bands report hot
    assert len(report) == dedup.SIMHASH_BANDS
    assert (report["width"] == len(rows)).all()
    assert len(dedup.simhash_neardups(df).toPandas()) == 0


def test_simhash_neardups_hamming_filter(spark):
    base = ("quick brown fox jumps over the lazy dog near the quiet river bank "
            "while morning light settles on tall grass and old stones " * 3)
    variant = base.replace("river", "creek", 1)
    rng_words = "zeta omega kappa lambda sigma " * 20
    rows = [
        {"doc_id": "a", "text": base},
        {"doc_id": "b", "text": variant},
        {"doc_id": "c", "text": rng_words},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = dedup.simhash_neardups(df).toPandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert ("a", "b") in pairs, out
    assert all(h <= dedup.SIMHASH_HAM_MAX for h in out["hamming"])
    assert not any("c" in p for p in pairs)
