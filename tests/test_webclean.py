"""Web-corpus hygiene operators: boilerplate-line removal (CCNet/C4
frequency rule), PII redaction, URL/domain stats, deterministic hash
sampling. Toy inputs pin each rule's semantics; the synthesized-corpus
byte parity vs DuckDB is covered by test_oracle_queries (web_* entries)."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import webclean


def make_web(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, web_text string")


def test_boilerplate_frequency_rule_and_cap(spark):
    # "promo" in 3 docs, "rare" in 2 → min_df=3 keeps only promo
    rows = [
        ("a", "alpha words here\npromo line"),
        ("b", "beta words here\npromo line\nrare line"),
        ("c", "gamma words here\npromo line\nrare line"),
    ]
    out = webclean.boilerplate_lines(make_web(spark, rows), min_df=3, cap=10).collect()
    assert [(r.line, r.doc_freq) for r in out] == [("promo line", 3)]
    # cap=1 with min_df=2 keeps the most frequent; tie broken by line asc
    out = webclean.boilerplate_lines(make_web(spark, rows), min_df=2, cap=1).collect()
    assert [(r.line, r.doc_freq) for r in out] == [("promo line", 3)]


def test_within_doc_repeat_counts_once(spark):
    # a line repeated 5x inside ONE doc must not reach min_df=2
    rows = [("a", "dup line\ndup line\ndup line\ndup line\ndup line")]
    out = webclean.boilerplate_lines(make_web(spark, rows), min_df=2, cap=10).collect()
    assert out == []


def test_strip_removes_exactly_the_frequent_lines(spark):
    rows = [
        ("a", "keep one\npromo line\nkeep two"),
        ("b", "promo line\nother text"),
        ("c", "third body\npromo line"),
    ]
    out = {
        r.doc_id: r
        for r in webclean.strip_boilerplate(make_web(spark, rows), min_df=3, cap=10).collect()
    }
    assert out["a"].clean_text == "keep one\nkeep two"
    assert (out["a"].n_lines, out["a"].n_removed) == (3, 1)
    assert out["b"].clean_text == "other text"
    assert out["c"].n_removed == 1


def test_overflow_reported_and_overflowed_lines_not_stripped(spark):
    # two qualifying lines, cap=1: the less frequent one ("aa promo", tie
    # broken by line asc picks it... both df=2; line asc keeps "aa promo")
    rows = [
        ("a", "aa promo\nzz promo\nbody a"),
        ("b", "aa promo\nzz promo\nbody b"),
    ]
    web = make_web(spark, rows)
    (rep,) = webclean.boilerplate_overflow(web, min_df=2, cap=1).collect()
    assert (rep.n_qualifying, rep.n_broadcast, rep.n_overflow) == (2, 1, 1)
    out = {r.doc_id: r for r in webclean.strip_boilerplate(web, min_df=2, cap=1).collect()}
    # only the broadcast line is stripped; the overflowed one survives
    assert out["a"].clean_text == "zz promo\nbody a"
    assert out["a"].n_removed == 1
    (rep0,) = webclean.boilerplate_overflow(web, min_df=2, cap=10).collect()
    assert (rep0.n_qualifying, rep0.n_broadcast, rep0.n_overflow) == (2, 2, 0)


def test_fractional_threshold_is_scale_stable(spark):
    """The absolute min_df degrades at 10x corpus (every line shared by a
    handful of docs qualifies); the fractional threshold returns the SAME
    line set — the scale-adaptive contract (cf. tests/test_scale_adaptive.py
    for the LSH key spaces)."""
    from pdfextract_spark.functions.webclean import synthesize_web

    docs1 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # replicate 10x with distinct doc_ids (same line content per replica)
    docs10 = docs1.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep"), "*"
    ).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    # absolute threshold: replicate the LINE CONTENT independent of doc_id
    # by hashing only the line text — synthesize_web keys its md5 draws off
    # doc_id, so replicas get different PII lines but identical base lines;
    # base lines with df=2 at 1x reach df>=20 at 10x and flood min_df=10
    web1, web10 = synthesize_web(docs1), synthesize_web(docs10)
    abs1 = {r.line for r in webclean.boilerplate_lines(web1, min_df=10, cap=10_000).collect()}
    abs10 = {r.line for r in webclean.boilerplate_lines(web10, min_df=10, cap=10_000).collect()}
    assert len(abs10) > 10 * len(abs1)  # absolute threshold floods at 10x

    frac = webclean.MIN_DF_FRAC
    f1 = {r.line for r in webclean.boilerplate_lines(web1, min_df_frac=frac, cap=10_000).collect()}
    f10 = {r.line for r in webclean.boilerplate_lines(web10, min_df_frac=frac, cap=10_000).collect()}
    assert f1 == f10 == set(webclean.BOILERPLATE)  # scale-stable


def test_redact_counts_and_scrubs(spark):
    text = (
        "mail bob@x.example.com and sue@y.example.org visit "
        "https://a.example.net/p1 from 10.1.2.3 call +1-555-0100"
    )
    rows = [("a", text), ("b", "no pii at all")]
    out = {r.doc_id: r for r in webclean.redact_pii(make_web(spark, rows)).collect()}
    a = out["a"]
    assert (a.n_emails, a.n_urls, a.n_ips, a.n_phones) == (2, 1, 1, 1)
    for pat in (webclean.RE_EMAIL, webclean.RE_URL, webclean.RE_IPV4, webclean.RE_PHONE):
        assert not re.search(pat, a.redacted_text), pat
    assert a.redacted_text == (
        "mail <EMAIL> and <EMAIL> visit <URL> from <IP> call <PHONE>"
    )
    b = out["b"]
    assert (b.n_emails, b.n_urls, b.n_ips, b.n_phones) == (0, 0, 0, 0)
    assert b.redacted_text == "no pii at all"


def test_url_domain_stats(spark):
    rows = [
        ("a", "see https://d1.example.org/x and https://d1.example.org/y"),
        ("b", "see https://d1.example.org/z plus http://d2.example.net/q"),
    ]
    out = webclean.url_domain_stats(make_web(spark, rows)).collect()
    assert [(r.domain, r.n_urls, r.n_docs) for r in out] == [
        ("d1.example.org", 3, 2),
        ("d2.example.net", 1, 1),
    ]


def test_hash_sample_matches_md5_formula_and_is_deterministic(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_chars")
    )
    got = [r.doc_id for r in webclean.hash_sample(docs, pct=37).collect()]
    expect = {
        i
        for i in range(200)
        if int(hashlib.md5(f"sample|{i}".encode()).hexdigest()[:4], 16) % 100 < 37
    }
    assert {int(d) for d in got} == expect
    assert got == sorted(got)  # ordered by string doc_id, deterministically
    assert got == [r.doc_id for r in webclean.hash_sample(docs, pct=37).collect()]


def test_stratified_sample_is_nested_and_rate_respecting(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hi = {r.doc_id for r in webclean.stratified_hash_sample(docs, {"en": 80}, 40).collect()}
    lo = {r.doc_id for r in webclean.stratified_hash_sample(docs, {"en": 40}, 20).collect()}
    assert lo < hi  # halving every rate yields a strict subset (same buckets)
    by_lang = {
        r.lang: r.n
        for r in webclean.stratified_hash_sample(docs, {"en": 80}, 20)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en sampled at ~80%, everything else at ~20% (binomial tolerance)
    assert by_lang["en"] / totals["en"] > 0.6
    for lang, n in by_lang.items():
        if lang != "en":
            assert n / totals[lang] < 0.45


def test_synthesize_web_structure(spark):
    docs = spark.createDataFrame(
        [(7, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "s", 26)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    (row,) = webclean.synthesize_web(docs).collect()
    lines = row.web_text.split("\n")
    assert row.n_lines == len(lines)
    # base chunking: 9 words -> two lines of 8 + 1
    assert lines[0] == "w1 w2 w3 w4 w5 w6 w7 w8" and lines[1] == "w9"
    h = hashlib.md5(b"web|7").hexdigest()
    # every optional line matches its md5 gate
    expected = 2
    for k in range(4):
        if int(h[2 * k : 2 * k + 2], 16) % 3 == 0:
            assert webclean.BOILERPLATE[k] in lines
            expected += 1
    if int(h[8:10], 16) % 3 != 2:
        assert any(l.startswith("contact user") for l in lines)
        expected += 1
    if int(h[10:12], 16) % 4 == 0:
        assert any(l.startswith("mailto admin") for l in lines)
        expected += 1
    assert len(lines) == expected
