"""URL features: known synthesis variants map to exact feature values."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_variant_features(spark):
    out = entry.queries()["web_url_features"](spark, SF_DIR).toPandas()
    out["v"] = out.doc_id.astype(int) % 5
    by = out.groupby("v")
    # variants: 0 plain, 1 www+slash, 2 utm query, 3 fragment, 4 ?id=7
    assert (by.get_group(2).has_tracking).all()
    for v in (0, 1, 3, 4):
        assert not by.get_group(v).has_tracking.any()
    assert (by.get_group(3).has_fragment).all()
    assert (by.get_group(2).n_params == 2).all()
    assert (by.get_group(4).n_params == 1).all()
    assert (by.get_group(0).n_params == 0).all()
    # path is always /a/pNN -> depth 2 (host segment excluded)
    assert (out.path_depth == 2).all()
    assert (out.url_len >= 10).all()
