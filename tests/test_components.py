"""connected_components exactness (VERDICT r2 task #5).

The fixpoint check is now an exact changed-row count (not a hash-sum
signature), so convergence cannot be faked by a collision. These tests pin
the exact semantics against a Python union-find, including shapes chosen to
stress the loop: a long path whose min sits at the far end (maximum label
travel — pointer jumping must kick in for this to fit in CC_MAX_ITER) and a
labeling where many labels move in the same round by amounts that would
cancel in a naive sum-of-labels signature.
"""

import random

from pyspark.sql import functions as F

from pdfextract_spark.functions.dedup import CC_MAX_ITER, connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a string, doc_b string"
    )
    got = {r.doc_id: r.rep for r in connected_components(df).collect()}
    exp = _union_find(edges)
    assert got == exp
    return got


def test_long_path_min_at_far_end(spark):
    # path d999 - d998 - ... - d000: every node's rep is d000, which is
    # (2**CC_MAX_ITER justifying) 999 hops from the far end — only the
    # pointer-jumping term makes this converge within CC_MAX_ITER rounds
    n = 1000
    assert n < 2 ** CC_MAX_ITER
    ids = [f"d{i:03d}" for i in range(n)]
    edges = list(zip(ids, ids[1:]))
    got = _run(spark, edges)
    assert set(got.values()) == {"d000"}


def test_cancelling_moves_same_round(spark):
    # two stars whose centers swap roles: in one round, node x's label drops
    # by k while node y's drops by -k under any numeric encoding — a
    # sum-of-labels signature could stay flat; the changed-count cannot
    edges = [("b", "a"), ("c", "d"), ("b", "c")]
    got = _run(spark, edges)
    assert set(got.values()) == {"a"}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    ids = [f"n{i:02d}" for i in range(60)]
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_already_converged_input_is_one_round(spark):
    # isolated pairs: converged after round 1; the exact check must stop
    # immediately (no prev-signature warmup round)
    edges = [(f"p{i}", f"q{i}") for i in range(8)]
    got = _run(spark, edges)
    assert all(v.startswith("p") for v in got.values())
