"""Physical-plan shape assertions for the round-4 operators: the
zero-shuffle claims in their docstrings are enforced here so a future
change cannot silently regress them, and the shuffle-bearing ops are
pinned to their intended Exchange budget (hard hints stay absent — AQE
decides broadcast at runtime)."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.dedup import exact_substr_removal
from pdfextract_spark.functions.multimodal import (
    interleave_stats,
    media_asset_dedup,
)
from pdfextract_spark.functions.textops import quality_classifier
from pdfextract_spark.functions.webclean import c4_filters, synthesize_c4
from pdfextract_spark.sources.adapters import documents_to_interleaved_rich

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_c4_filters_zero_shuffle(docs):
    plan = _plan(c4_filters(synthesize_c4(docs)))
    assert "Exchange" not in plan, plan[:800]


def test_interleave_stats_zero_shuffle(docs):
    plan = _plan(interleave_stats(documents_to_interleaved_rich(docs)))
    assert "Exchange" not in plan, plan[:800]


def test_quality_classifier_zero_shuffle(docs):
    plan = _plan(quality_classifier(docs))
    assert "Exchange" not in plan, plan[:800]


def test_media_dedup_census_shuffle_budget(docs):
    # the census is one logical groupBy; countDistinct(doc_id) planizes as
    # the standard two-phase aggregate — Exchange on (asset_id, doc_id)
    # then on asset_id — plus the final orderBy's range Exchange. All three
    # are keyed with map-side partials; nothing else may shuffle.
    plan = _plan(media_asset_dedup(documents_to_interleaved_rich(docs)))
    assert plan.count("Exchange") <= 3, plan[:1200]
    assert "partial_count" in plan, plan[:1200]


def test_substr_removal_no_hard_broadcast_hint(docs):
    # the census join must NOT carry a planner-forced broadcast: at this SF
    # AQE may pick broadcast at runtime, but the analyzed plan carries no
    # ResolvedHint (hard hints on corpus-sized frames are the round-3
    # scale-killer pattern)
    df = exact_substr_removal(docs)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


from pdfextract_spark.functions.textops import (
    lang_fertility,
    quality_weighted_sample,
    synthesize_multilingual,
)
from pdfextract_spark.functions.webclean import (
    badwords_filter,
    encoding_fix,
    synthesize_badwords,
    synthesize_encoding,
)


def test_weighted_sample_zero_shuffle(docs):
    plan = _plan(quality_weighted_sample(docs))
    assert "Exchange" not in plan, plan[:800]


def test_encoding_fix_zero_shuffle(docs):
    plan = _plan(encoding_fix(synthesize_encoding(docs)))
    assert "Exchange" not in plan, plan[:800]


def test_badwords_zero_shuffle(docs):
    plan = _plan(badwords_filter(synthesize_badwords(docs)))
    assert "Exchange" not in plan, plan[:800]


def test_lang_fertility_one_shuffle(docs):
    # ONE hash aggregation onto the 4-key language space with a map-side
    # partial (the reduce side moves |langs| rows per task, not docs)
    plan = _plan(lang_fertility(synthesize_multilingual(docs)))
    assert plan.count("Exchange") == 1, plan[:1200]
    assert "partial_count" in plan or "partial_sum" in plan, plan[:1200]


from pdfextract_spark.functions.multimodal import image_filters, media_meta_query
from pdfextract_spark.functions.packing import chunk_interleaved
from pdfextract_spark.functions.webclean import epoch_shuffle


def test_image_filters_zero_shuffle(docs):
    # gates ride the mapInPandas decode stage — no Exchange anywhere
    plan = _plan(image_filters(media_meta_query(docs)))
    assert "Exchange" not in plan, plan[:800]


def test_chunk_interleaved_zero_shuffle(docs):
    plan = _plan(chunk_interleaved(documents_to_interleaved_rich(docs)))
    assert "Exchange" not in plan, plan[:800]


def test_epoch_shuffle_one_exchange(docs):
    # ONE hash Exchange on the shard key feeding the per-shard sort; never
    # a global (range) sort
    plan = _plan(epoch_shuffle(docs))
    assert plan.count("Exchange") == 1, plan[:1200]
    assert "rangepartitioning" not in plan.lower(), plan[:1200]


from pdfextract_spark.functions.multimodal import media_phash_neardup


def test_phash_neardup_planted_geometry(docs):
    # the stand-in hash plants one scene per pair of adjacent asset nums:
    # recall must be ALL 16 scene partners (hamming <= 2), and the random
    # cross-scene distance (~30 bits) must produce zero false positives
    rows = media_phash_neardup(documents_to_interleaved_rich(docs)).collect()
    got = {(r.asset_a, r.asset_b) for r in rows}
    want = {(f"asset{2*s}", f"asset{2*s+1}") for s in range(16)}
    assert got == want, got ^ want
    assert all(r.hamming <= 2 for r in rows)


def test_phash_neardup_shuffle_budget(docs):
    # distinct assets + band census + bucket grouping + pair dedup — a
    # fixed Exchange budget, no cartesian, no hard broadcast hint
    df = media_phash_neardup(documents_to_interleaved_rich(docs))
    plan = _plan(df)
    assert plan.count("Exchange") <= 5, plan[:1500]
    assert "CartesianProduct" not in plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


from collections import Counter

from pdfextract_spark.functions.multimodal import media_dedup_apply


def test_media_dedup_apply_contract(docs):
    inter = documents_to_interleaved_rich(docs)
    rows = media_dedup_apply(inter).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_text_in = {
        r["doc_id"]: sum(1 for s in r["spans"] if s["kind"] == "text")
        for r in inter.collect()
    }
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.new_offset)
        # offsets dense 0..n-1 and order-preserving vs the original
        assert [r.new_offset for r in rs] == list(range(len(rs)))
        olds = [r.old_offset for r in rs]
        assert olds == sorted(olds)
        # every text span survives
        assert sum(1 for r in rs if r.kind == "text") == n_text_in[doc]
    # corpus-wide: at most one occurrence per asset survives
    assets = Counter(
        int(hashlib.md5(r.media_ref.encode()).hexdigest()[:4], 16) % 32
        for r in rows if r.kind == "media"
    )
    assert assets and max(assets.values()) == 1


import hashlib  # noqa: E402  (used above at call time)


def test_media_dedup_apply_plan(docs):
    df = media_dedup_apply(documents_to_interleaved_rich(docs))
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


from pdfextract_spark.functions.webclean import synthesize_urls, url_dedup


def test_url_dedup_one_exchange_and_planted_groups(docs):
    df = url_dedup(synthesize_urls(docs))
    plan = _plan(df)
    # canonicalization is narrow; the keeper window is the ONE Exchange
    assert plan.count("Exchange") == 1, plan[:1200]
    rows = df.collect()
    # variants 0-3 of each 5-group collapse; variant 4 stays distinct
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical, []).append(r)
    sizes = sorted(len(v) for v in by_canon.values())
    assert set(sizes) == {1, 4}
    for rs in by_canon.values():
        keeper = min(int(r.doc_id) for r in rs)
        assert all((int(r.doc_id) == keeper) == r.is_keeper for r in rs)
        assert all(r.keeper_doc == keeper for r in rs)


from pdfextract_spark.functions.webclean import synthesize_urls_messy, url_dedup_params


def test_url_dedup_params_collapse(docs):
    df = url_dedup_params(synthesize_urls_messy(docs))
    assert _plan(df).count("Exchange") == 1
    rows = df.collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical, []).append(r)
    # reordered / tracking-in-middle / fragment variants all collapse with
    # the sorted-params form; the changed-value variant stays distinct
    sizes = sorted(len(v) for v in by_canon.values())
    assert set(sizes) == {1, 4}
    assert all("utm_" not in c for c in by_canon)


from pdfextract_spark.functions.textops import winnowing_fingerprints


def test_winnowing_guarantee_and_density(spark, docs):
    # guarantee: docs sharing a substring of >= w+k-1 = 6 tokens share a
    # selected fingerprint at the aligned position
    a = "alpha beta gamma delta epsilon zeta shared run of six tokens here x1"
    b = "totally different prefix words shared run of six tokens here and on"
    df = spark.createDataFrame([("a", a), ("b", b)], "doc_id string, text string")
    rows = winnowing_fingerprints(df).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps["a"] & fps["b"], "shared 6-token run must share a fingerprint"
    plan = _plan(winnowing_fingerprints(docs))
    # only the self-disabling balancing repartition may shuffle (small corpus
    # scans as one split); nothing data-dependent
    assert plan.count("Exchange") <= 1, plan[:800]
    if "Exchange" in plan:
        assert "roundrobin" in plan.lower(), plan[:800]
    # regression guard (round-4, measured 20x): the selection expression must
    # appear exactly once — an explode over a projected attribute makes
    # InferFiltersFromGenerate push the whole nested expression into a
    # scan-level interpreted Filter, duplicating it
    assert plan.count("array_distinct") == 1, plan[:1200]
    # density: the selected set is a real shrink of the full gram index
    # (expected ~2/(w+1)=0.4) but never empty per eligible doc
    full = winnowing_fingerprints(docs).groupBy("doc_id").count().collect()
    from pyspark.sql import functions as FF
    gram_counts = {
        r.doc_id: r.n
        for r in docs.select(
            FF.col("doc_id").cast("string").alias("doc_id"),
            (FF.size(FF.split("text", " ")) - 2).alias("n"),
        ).collect()
    }
    for r in full:
        assert 0 < r["count"] <= max(1, gram_counts[r.doc_id])
    total_sel = sum(r["count"] for r in full)
    total_grams = sum(max(0, v) for v in gram_counts.values())
    assert total_sel / total_grams < 0.7  # real shrink vs the full index


from pdfextract_spark.functions.textops import winnowing_overlap


def test_winnowing_overlap_planted_pair(spark):
    # a and b share a 20-token passage (18 shared 3-grams -> several shared
    # window minima); c shares nothing. The MOSS report must contain exactly
    # the (a, b) pair, with integer per-mille coverage of each side's set.
    shared = " ".join(f"tok{i}" for i in range(20))
    a = "alpha beta gamma delta " + shared + " omega psi chi phi"
    b = "one two three four five six " + shared + " seven eight"
    c = "completely unrelated words nowhere near the planted passage at all"
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c)], "doc_id string, text string"
    )
    rows = winnowing_overlap(df).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [("a", "b")]
    r = rows[0]
    assert r.n_shared >= 2
    assert 0 < r.pm_a <= 1000 and 0 < r.pm_b <= 1000


def test_winnowing_overlap_no_hard_hints(docs):
    # the hot-fingerprint cut must stay an AQE-decided anti-join: no
    # broadcast hint anywhere in the logical plan (round-3 judge finding)
    logical = winnowing_overlap(docs)._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical


def test_readability_zero_shuffle(docs):
    from pdfextract_spark.functions.textops import readability

    plan = _plan(readability(docs))
    assert "Exchange" not in plan, plan[:800]


def test_caption_pairs_single_sort_no_extra_shuffle(docs):
    # caption_pairs is Project + Generate; the only Exchange allowed is the
    # final orderBy's range partitioning (driver-contract ordering)
    from pdfextract_spark.functions.multimodal import caption_pairs

    plan = _plan(caption_pairs(documents_to_interleaved_rich(docs)))
    assert plan.count("Exchange") <= 1, plan[:1200]
    assert "rangepartitioning" in plan.lower(), plan[:1200]


def test_host_rank_no_hard_broadcast_hint(docs):
    # the per-iteration rank joins must carry no planner-forced broadcast —
    # AQE picks the strategy from actual sizes (the host universe is tiny
    # here but the operator must not assume it)
    from pdfextract_spark.functions.graphops import host_rank

    logical = (
        host_rank(docs.select("doc_id"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in logical, logical[:800]
