#!/usr/bin/env python
"""Cluster entry point: end-to-end training-data hygiene via spark-submit.

    spark-submit --py-files dist/pdfextract_spark.zip jobs/hygiene_job.py \\
        --input  /path/to/documents.parquet \\
        --output /path/to/hygiene_out \\
        [--min-df 10] [--boiler-cap 256] [--sample-pct 100] \\
        [--pack-budget 0] [--n-streams 64]

The C4/Gopher/CCNet-style recipe, stage order: encoding hygiene
(ftfy-lite mojibake repair + dead-bytes gate) + badword blocklist gate ->
corpus-wide boilerplate-line strip -> PII redaction -> quality gates ->
unigram-LM perplexity gate -> readability floor (opt-in) ->
exact-dedup keeper selection ->
deterministic hash sample -> optional sequence packing.

Scale discipline: every per-document stage is computed as a FLAG or
TRANSFORM COLUMN on one DataFrame — the corpus is traversed, not
re-filtered stage by stage. Total corpus passes: ONE boilerplate census
(persisted; the capped set and the overflow report both read it), the
LM token census + doc_id score join (disable with --ppx-gate 0), the
dedup-keeper window (one shuffle on the content hash), one metrics
aggregate, one filtered write (+ the packing shuffle when --pack-budget
is set). Every drop is counted in metrics.json — stages never discard
silently.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, Window, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-df", type=int, default=10)
    ap.add_argument("--boiler-cap", type=int, default=256)
    ap.add_argument("--sample-pct", type=int, default=100)
    ap.add_argument("--pack-budget", type=int, default=0)
    ap.add_argument("--n-streams", type=int, default=64)
    ap.add_argument(
        "--ppx-gate",
        type=int,
        default=None,
        help="unigram-LM perplexity gate in 1/16-bit mean-surprisal units "
        "(default: textops.PPX_GATE_Q4); 0 disables the stage",
    )
    ap.add_argument(
        "--read-floor",
        type=int,
        default=0,
        help="readability floor in Flesch milli-units: docs with "
        "flesch_milli below this are flagged (e.g. -100000 drops only "
        "gibberish-grade extremes); 0 disables the stage (default)",
    )
    ap.add_argument(
        "--entropy-gate",
        action="store_true",
        help="enable the two-tail character-entropy gate (repeated-char "
        "junk below ENTROPY_LOW_GATE_Q4, random-ish payloads above "
        "ENTROPY_HIGH_GATE_Q4 — the same kernel as text_char_entropy); "
        "disabled by default",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("pdfextract-spark-hygiene").getOrCreate()
    # imports AFTER the session exists so --py-files zips resolve on executors
    from pdfextract_spark.functions import packing, textops, webclean
    from pdfextract_spark.sources.readers import read_documents

    docs = read_documents(spark, args.input).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )

    # -- stage 0: encoding hygiene (ftfy-lite) + badword blocklist gate -----
    # mojibake repair and replacement/control strip run FIRST so every
    # downstream census sees repaired text (the ftfy-before-everything rule);
    # both gates are pure Column algebra on the same scan. The badword rule
    # is a flag, not a rewrite (C4 drops the page, never edits it).
    t0 = F.col("text")
    n_repl = F.length(t0) - F.length(
        F.replace(t0, F.lit(webclean.REPL_CHAR), F.lit(""))
    )
    # integer form of repl_per_mille > gate (no division; len 0 -> false)
    enc_bad = (n_repl * 1000) > (F.length(t0) * webclean.ENC_MAX_REPL_PERMILLE)
    fixed = F.replace(
        F.replace(t0, F.lit(webclean.MOJI_APOS), F.lit("’")),
        F.lit(webclean.MOJI_EACUTE), F.lit("é"),
    )
    fixed = F.replace(
        F.replace(fixed, F.lit(webclean.REPL_CHAR), F.lit("")),
        F.lit(webclean.CTRL_BELL), F.lit(""),
    )
    toks0 = F.filter(F.split(F.lower(t0), " "), lambda w: w != "")
    has_badword = (
        F.size(F.filter(toks0, lambda w: w.isin(*webclean.BADWORDS))) > 0
    )
    docs = docs.select(
        "doc_id",
        fixed.alias("text"),
        enc_bad.alias("enc_bad"),
        has_badword.alias("has_badword"),
    )

    # -- stage 1: boilerplate-line strip (ONE census, persisted, shared by
    # the capped set and the overflow report) -------------------------------
    web = docs.select("doc_id", F.col("text").alias("web_text"))
    census = webclean.boilerplate_census(web).persist()
    blist = webclean.boilerplate_lines(
        web, args.min_df, args.boiler_cap, census=census
    ).agg(F.sort_array(F.collect_list("line")).alias("blines"))
    overflow = webclean.boilerplate_overflow(
        web, args.min_df, args.boiler_cap, census=census
    ).first()
    lines = F.split("text", "\n")
    kept_lines = F.filter(lines, lambda l: ~F.array_contains(F.col("blines"), l))
    df = docs.crossJoin(F.broadcast(blist)).select(
        "doc_id", "enc_bad", "has_badword",
        (F.size(lines) - F.size(kept_lines)).alias("boiler_removed"),
        F.array_join(kept_lines, "\n").alias("text"),
    )

    # -- stage 2: PII redaction (pure Column regexes) ------------------------
    t = F.col("text")
    n_pii = (
        F.regexp_count(t, F.lit(webclean.RE_EMAIL))
        + F.regexp_count(t, F.lit(webclean.RE_URL))
        + F.regexp_count(t, F.lit(webclean.RE_IPV4))
        + F.regexp_count(t, F.lit(webclean.RE_PHONE))
    )
    red = F.regexp_replace(t, webclean.RE_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, webclean.RE_URL, "<URL>")
    red = F.regexp_replace(red, webclean.RE_IPV4, "<IP>")
    red = F.regexp_replace(red, webclean.RE_PHONE, "<PHONE>")
    df = df.select(
        "doc_id", "enc_bad", "has_badword", "boiler_removed",
        n_pii.alias("pii_found"), red.alias("text"),
    )

    # -- stage 3: quality gates (Gopher-style, same rules as the query) -----
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_wlen = F.length(F.regexp_replace("text", " ", "")) / n_words
    digit_words = F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ok_quality = (
        (n_words >= 5)
        & (n_words <= 100000)
        & (mean_wlen >= 2.0)
        & (mean_wlen <= 12.0)
        & ((digit_words / n_words) <= 0.3)
        & (stop_hits >= 1)
    )
    df = df.withColumn("ok_quality", ok_quality)

    # -- stage 3b: unigram-LM perplexity gate (CCNet's model-based half of
    # the quality filter; the rule gates above are the heuristic half).
    # Trains the capped-vocabulary LM on the post-strip corpus itself (one
    # token census) and flags the high-perplexity tail. Cost: the census
    # shuffle + one doc_id join; docs with zero tokens carry no LM evidence
    # and are left unflagged (the rule gates already drop them). -----------
    ppx_gate = args.ppx_gate if args.ppx_gate is not None else textops.PPX_GATE_Q4
    if ppx_gate > 0:
        ppx = textops.unigram_perplexity(df.select("doc_id", "text")).select(
            "doc_id",
            "mean_surprisal_q4",
            (F.col("mean_surprisal_q4") > ppx_gate).alias("ppx_flag"),
        )
        df = df.join(ppx, "doc_id", "left").withColumn(
            "ppx_flag", F.coalesce(F.col("ppx_flag"), F.lit(False))
        )
    else:
        df = df.withColumn("ppx_flag", F.lit(False))

    # -- stage 3c: readability floor (opt-in; Flesch milli-units, the same
    # integer kernel as the text_readability query). Pure Column algebra on
    # the post-strip text — a flag in the SAME projection, zero shuffle. ----
    if args.read_floor != 0:
        rw, rs, ry = textops.readability_counts(F.col("text"))
        df = df.withColumn(
            "read_flag", textops.flesch_milli(rw, rs, ry) < args.read_floor
        )
    else:
        df = df.withColumn("read_flag", F.lit(False))

    # -- stage 3d: character-entropy gate (opt-in; BOTH tails, the same
    # kernel as the text_char_entropy query). The census array and fold run
    # in-row on the post-strip text — zero shuffle; the array attributes
    # drop out of the projection immediately. ------------------------------
    if args.entropy_gate:
        ent = (
            df.withColumn("_ch", textops.entropy_char_array(F.col("text")))
            .withColumn("_n", F.size("_ch").cast("long"))
            .withColumn(
                "_h",
                F.when(F.col("_n") > 0, textops.entropy_q4_expr()).otherwise(
                    F.lit(0)
                ),
            )
        )
        df = ent.withColumn(
            "ent_flag",
            (F.col("_h") < textops.ENTROPY_LOW_GATE_Q4)
            | (F.col("_h") > textops.ENTROPY_HIGH_GATE_Q4),
        ).drop("_ch", "_n", "_h")
    else:
        df = df.withColumn("ent_flag", F.lit(False))

    # -- stage 4: exact-dedup keeper (one shuffle on the content hash) ------
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    df = df.withColumn("is_keeper", F.row_number().over(w) == 1)

    # -- stage 5: deterministic hash sample ---------------------------------
    h = F.md5(F.concat(F.lit("sample|"), F.col("doc_id")))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 100
    df = df.withColumn("sampled", bucket < args.sample_pct)
    df = df.withColumn(
        "keep",
        ~F.col("enc_bad")
        & ~F.col("has_badword")
        & F.col("ok_quality")
        & ~F.col("ppx_flag")
        & ~F.col("read_flag")
        & ~F.col("ent_flag")
        & F.col("is_keeper")
        & F.col("sampled"),
    )

    # -- metrics (ONE aggregate pass) + filtered write (one more) -----------
    m = df.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum("boiler_removed").alias("boiler_lines_removed"),
        F.sum("pii_found").alias("pii_redacted"),
        F.sum(F.when(F.col("enc_bad"), 1).otherwise(0)).alias("dropped_encoding"),
        F.sum(F.when(F.col("has_badword"), 1).otherwise(0)).alias("dropped_badword"),
        F.sum(F.when(~F.col("ok_quality"), 1).otherwise(0)).alias("dropped_quality"),
        F.sum(F.when(F.col("ppx_flag"), 1).otherwise(0)).alias("dropped_perplexity"),
        F.sum(F.when(F.col("read_flag"), 1).otherwise(0)).alias("dropped_readability"),
        F.sum(F.when(F.col("ent_flag"), 1).otherwise(0)).alias("dropped_entropy"),
        F.sum(F.when(~F.col("is_keeper"), 1).otherwise(0)).alias("dropped_dups"),
        F.sum(F.when(~F.col("sampled"), 1).otherwise(0)).alias("dropped_sample"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("docs_out"),
    ).first()

    out = df.filter("keep").select("doc_id", "text")
    out.write.mode("overwrite").parquet(f"{args.output}/clean")

    if args.pack_budget > 0:
        packed = packing.pack_sequences(
            out.withColumn("doc_id", F.col("doc_id").cast("long")),
            budget=args.pack_budget,
            n_streams=args.n_streams,
        )
        packed.write.mode("overwrite").parquet(f"{args.output}/packed")

    metrics = {
        "docs_in": m.docs_in,
        "docs_out": int(m.docs_out or 0),
        "boiler_lines_removed": int(m.boiler_lines_removed or 0),
        "boiler_set": {
            "n_qualifying": overflow.n_qualifying,
            "n_broadcast": overflow.n_broadcast,
            "n_overflow": overflow.n_overflow,
        },
        "pii_redacted": int(m.pii_redacted or 0),
        "dropped_encoding": int(m.dropped_encoding or 0),
        "dropped_badword": int(m.dropped_badword or 0),
        "dropped_quality": int(m.dropped_quality or 0),
        "dropped_perplexity": int(m.dropped_perplexity or 0),
        "dropped_readability": int(m.dropped_readability or 0),
        "ppx_gate": ppx_gate,
        "read_floor": args.read_floor,
        "dropped_entropy": int(m.dropped_entropy or 0),
        "entropy_gate": bool(args.entropy_gate),
        "dropped_dups": int(m.dropped_dups or 0),
        "dropped_sample": int(m.dropped_sample or 0),
        "packed": bool(args.pack_budget > 0),
    }
    # metrics go through the SAME Hadoop filesystem as the data writes, so an
    # hdfs:// or s3:// --output works end-to-end (round-3 advice: a local
    # open() would crash — or write to a bogus local dir — after all the
    # heavy work succeeded)
    jvm = spark._jvm
    mpath = jvm.org.apache.hadoop.fs.Path(f"{args.output}/metrics.json")
    fs = mpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(mpath, True)
    try:
        stream.write(bytearray(json.dumps(metrics, indent=1).encode("utf-8")))
    finally:
        stream.close()
    print(json.dumps(metrics))
    census.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
