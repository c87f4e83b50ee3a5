"""The flagship oracle fixture (fixtures/expected_spans_sf*.parquet) must stay
in sync with the live Python oracle — a stale fixture would silently hollow
out the driver's extract_pipeline value check.

Strategy: recompute the oracle spans for a deterministic sample of documents
from the driver corpus and compare to the committed fixture rows.
"""

import os

import pandas as pd
import pytest

from pdfextract_spark.oracle.document import extract_document
from pdfextract_spark.sources.adapters import documents_to_interleaved

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "expected_spans_sf0.01.parquet")
SF_DIR = "/root/testdata/sf0.01"
N_SAMPLE = 60


@pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and os.path.exists(f"{SF_DIR}/documents.parquet")),
    reason="fixture or driver corpus missing",
)
def test_fixture_matches_live_oracle(spark):
    fx = pd.read_parquet(FIXTURE)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inter = documents_to_interleaved(docs).toPandas()
    # deterministic sample: every k-th doc in doc_id order
    inter = inter.sort_values("doc_id").reset_index(drop=True)
    step = max(1, len(inter) // N_SAMPLE)
    sample = inter.iloc[::step]

    checked = 0
    for doc_id, spans in zip(sample["doc_id"], sample["spans"]):
        expected = extract_document(
            doc_id,
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [int(s["offset"]) for s in spans],
        )
        got = fx[fx.doc_id == doc_id].sort_values("seq")
        assert list(got["seq"]) == list(range(len(expected))), doc_id
        assert list(zip(got["kind"], got["text"], got["media_ref"])) == [
            (s.kind, s.text, s.media_ref) for s in expected
        ], doc_id
        checked += 1
    assert checked >= min(N_SAMPLE, len(inter)) // 2

    # every fixture doc_id exists in the corpus (no orphan rows)
    assert set(fx["doc_id"]).issubset(set(inter["doc_id"]))
