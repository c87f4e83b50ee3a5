"""Temperature sampling semantics: alpha=0.5 damps the head language and
boosts the tail, the exact-isqrt correction really is exact, rate/epoch
arithmetic, and determinism. Value parity runs in the oracle suite
(corpus_temperature_sample)."""

import math

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.webclean import temperature_mixture


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% english, 9% german, 1% icelandic — the crawl-head shape
    rows = []
    for i in range(900):
        rows.append((i, "the quick brown fox " * 5, "en"))
    for i in range(900, 990):
        rows.append((i, "der schnelle braune fuchs " * 5, "de"))
    for i in range(990, 1000):
        rows.append((i, "fljoti bruni refurinn hoppar " * 5, "is"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def report(skewed):
    return {r["lang"]: r for r in temperature_mixture(skewed).collect()}


def test_temperature_rebalances(report):
    # raw shares: en 900, de 90, is 10 per-mille; sqrt flattens to
    # 30:9.5:3.2 -> the tail's share multiplies, the head's shrinks
    assert report["en"]["temp_share_pm"] < report["en"]["share_pm"]
    assert report["is"]["temp_share_pm"] > report["is"]["share_pm"]
    assert report["de"]["temp_share_pm"] > report["de"]["share_pm"]
    # ordering by mass is preserved (temperature flattens, never inverts)
    assert (
        report["en"]["temp_share_pm"]
        > report["de"]["temp_share_pm"]
        > report["is"]["temp_share_pm"]
    )


def test_tail_upsampled_head_cut(report):
    # under a 50% budget the tail language needs repeats (rate capped at
    # 1000, epochs >= 1) while the head keeps less than its raw share
    assert report["is"]["rate_pm"] == 1000
    assert report["is"]["epochs"] >= 1
    assert report["en"]["rate_pm"] < 500
    assert report["en"]["epochs"] == 0


def test_isqrt_exactness(spark):
    # the +-1 integer correction makes floor-sqrt exact at perfect squares
    # and just below/above them, where double rounding bites
    from pdfextract_spark.functions.webclean import _isqrt_expr

    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17, 10**12, 10**12 + 1,
            (10**6) ** 2 - 1, (10**6) ** 2, 4503599627370496]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    out = df.select("n", F.expr(_isqrt_expr("n")).alias("s")).collect()
    for r in out:
        assert r["s"] == math.isqrt(r["n"]), (r["n"], r["s"])


def test_budget_and_coin(report):
    # kept tokens track rate_pm in expectation (md5 coin, generous slack)
    for lang, r in report.items():
        if r["rate_pm"] == 1000:
            assert r["kept_docs"] == r["n_docs"]
        else:
            expect = r["n_tokens"] * r["rate_pm"] / 1000
            assert abs(r["kept_tokens"] - expect) <= 0.25 * r["n_tokens"]


def test_deterministic(skewed, report):
    again = {r["lang"]: r for r in temperature_mixture(skewed).collect()}
    assert again == report
