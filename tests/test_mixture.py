"""Token-budget mixture sampling: budget math, nesting, determinism."""

from pdfextract_spark.functions.webclean import (
    MIX_WEIGHTS,
    mixture_audit,
    mixture_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def test_targets_sum_to_budget(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = mixture_audit(docs).collect()
    total = sum(r["toks_lang"] for r in rows)
    target = sum(r["target_tokens"] for r in rows)
    # integer floor division loses at most (n_langs * w_sum) tokens
    budget = total * 50 // 100
    assert budget - len(rows) * sum(MIX_WEIGHTS.values()) <= target <= budget


def test_rate_caps_at_keep_everything(spark):
    """A language whose target exceeds its actual tokens keeps everything
    (rate_pm == 1000), instead of oversampling other languages' budget."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = mixture_audit(docs, weights={"zh": 100}, default_w=1).collect()
    zh = next(r for r in rows if r["lang"] == "zh")
    assert zh["rate_pm"] == 1000
    assert zh["achieved_tokens"] == zh["toks_lang"]


def test_budget_nesting(spark):
    """Raising the budget yields a strict superset (same md5 bucket cut):
    the reproducibility property rand()-based sampling cannot give."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    small = {r["doc_id"] for r in mixture_sample(docs, budget_pct=30).collect()}
    big = {r["doc_id"] for r in mixture_sample(docs, budget_pct=70).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_achieved_tracks_target(spark):
    """Hash sampling is exact in expectation; on 500 docs the achieved
    token count should sit within 25% of the target for every language
    that was actually down-sampled."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for r in mixture_audit(docs).collect():
        if r["rate_pm"] < 1000:
            assert abs(r["achieved_tokens"] - r["target_tokens"]) <= 0.25 * r["target_tokens"], r
