"""Hashed linear quality classifier: scoring semantics (determinism,
token-count weighting, empty-doc guard). Value parity vs DuckDB is the
parametrized oracle suite."""

from pdfextract_spark.functions.textops import (
    QC_THRESHOLD_MILLI,
    quality_classifier,
)


def test_scoring_semantics(spark):
    docs = spark.createDataFrame(
        [
            ("1", "alpha beta gamma"),
            ("2", "alpha beta gamma"),        # identical text -> identical score
            ("3", "alpha alpha alpha"),       # mean == single-token score
            ("4", "alpha"),
            ("5", ""),                        # empty -> 0 tokens, logit 0
        ],
        "doc_id string, text string",
    )
    r = {x["doc_id"]: x for x in quality_classifier(docs).collect()}
    assert r["1"]["logit_milli"] == r["2"]["logit_milli"]
    # a one-token doc's logit is 1000 * w(token); repeating the token
    # leaves the mean unchanged
    assert r["3"]["logit_milli"] == r["4"]["logit_milli"]
    assert r["5"]["n_tokens"] == 0 and r["5"]["logit_milli"] == 0
    for x in r.values():
        assert x["keep_doc"] == (x["logit_milli"] >= QC_THRESHOLD_MILLI)
