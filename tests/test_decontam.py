"""Benchmark decontamination: hand-built splits pin the n-gram overlap
semantics; the synthesized-corpus planted-positive recovery + byte parity
vs DuckDB runs in test_oracle_queries (corpus_decontaminate)."""

from pyspark.sql import functions as F

from pdfextract_spark.functions import decontam


def make_split(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, role string, text2 string")


def w(n, tag="x"):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_planted_passage_detected_and_counted(spark):
    bench_text = w(10, "b") + " secret alpha beta gamma delta eps zeta eta theta"
    # train doc A embeds the 9-word secret run -> 2 distinct 8-grams of it
    a = w(5, "a") + " secret alpha beta gamma delta eps zeta eta theta " + w(5, "c")
    rows = [
        ("0", "bench", bench_text),
        ("1", "train", a),
        ("2", "train", w(20, "z")),  # clean
    ]
    out = {r.doc_id: r for r in decontam.contamination_report(make_split(spark, rows)).collect()}
    assert out["1"].contaminated and out["1"].n_hits == 2
    assert not out["2"].contaminated and out["2"].n_hits == 0


def test_distinct_grams_counted_once(spark):
    # the same contaminated 8-gram repeated 3x in one train doc counts ONCE
    gram = "g0 g1 g2 g3 g4 g5 g6 g7"
    rows = [
        ("0", "bench", w(3, "b") + " " + gram),
        ("1", "train", " ".join([gram, w(8, "m"), gram, w(8, "n"), gram])),
    ]
    (r,) = decontam.contamination_report(make_split(spark, rows)).collect()
    assert (r.n_hits, bool(r.contaminated)) == (1, True)


def test_short_docs_yield_no_grams(spark):
    rows = [("0", "bench", w(3, "b")), ("1", "train", w(4, "b"))]
    (r,) = decontam.contamination_report(make_split(spark, rows)).collect()
    assert r.n_hits == 0


def test_synthesized_split_recovers_planted_positives(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    split = decontam.synthesize_eval_split(docs)
    rep = decontam.contamination_report(split)
    got = {r.doc_id: r.n_hits for r in rep.filter("contaminated").collect()}
    planted = {
        r.doc_id
        for r in split.filter(
            (F.col("role") == "train") & F.col("text2").endswith(decontam.PASSAGE)
        ).collect()
    }
    # every planted positive is recovered, with at least the passage's own
    # 8-grams (14 words -> 7 grams) as hits
    assert planted and planted <= set(got)
    assert all(got[d] >= 7 for d in planted)
    # flagged-but-not-planted docs are the corpus's OWN near-duplicates of
    # bench docs (the testdata deliberately contains near-dup documents for
    # the dedup operators) — genuine shared text, correct detections; they
    # must each share at least one real gram with a bench doc
    extras = set(got) - planted
    if extras:
        sample = sorted(extras)[0]
        (txt,) = split.filter(F.col("doc_id") == sample).select("text2").first()
        bench_texts = [r.text2 for r in split.filter("role = 'bench'").collect()]
        words = txt.split(" ")
        grams = {" ".join(words[i : i + 8]) for i in range(len(words) - 7)}
        assert any(g in bt for bt in bench_texts for g in grams)
