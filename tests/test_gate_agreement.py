"""Gate agreement: confusion totality, kappa identity vs python recompute,
consistency with the two standalone gate queries."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def row(spark):
    df = entry.queries()["text_gate_agreement"](spark, SF_DIR).toPandas()
    assert len(df) == 1
    return df.iloc[0]


def test_confusion_total(row):
    assert row.both_keep + row.rule_only + row.clf_only + row.both_drop == row.n


def test_kappa_identity(row):
    n, a, b, c, d = int(row.n), int(row.both_keep), int(row.rule_only), int(row.clf_only), int(row.both_drop)
    pe = (a + b) * (a + c) + (c + d) * (b + d)
    den = n * n - pe
    # truncating div toward zero, matching Spark's `div`
    num = 1000 * (n * (a + d) - pe)
    trunc = int(num / den) if den != 0 else 1000
    assert int(row.kappa_milli) == trunc
    assert int(row.agree_pm) == (1000 * (a + d)) // n


def test_marginals_match_standalone_gates(spark, row):
    qs = entry.queries()
    rules = qs["text_quality_rules"](spark, SF_DIR).toPandas()
    clf = qs["text_quality_classifier"](spark, SF_DIR).toPandas()
    assert int(rules.keep.sum()) == int(row.both_keep + row.rule_only)
    assert int(clf.keep_doc.sum()) == int(row.both_keep + row.clf_only)
